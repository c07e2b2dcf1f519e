"""jaccard_mapreduce_spark — a PySpark-native analytics engine.

A from-scratch, DataFrame-first reimplementation of the query and
data-processing capabilities of the reference repo ak811/jaccard-mapreduce
(a 3-job Hadoop MapReduce pipeline computing all-pairs Jaccard similarity
over a text corpus; see /root/reference, SURVEY.md), extended with the
operators a large-scale LLM training-data pipeline needs: deduplication
(exact / MinHash-LSH / SimHash / n-gram), similarity search over
embeddings, multimodal column plumbing, and text analysis.

Design stance (SURVEY.md §7.0): declarative DataFrame/SQL plans that
Catalyst can optimize; no RDDs; built-in `pyspark.sql.functions` in the
hot path; Pandas UDFs only where built-ins genuinely can't express the
semantics (multimodal decode); every reference behavior that is semantic
(tokenization regex, set semantics, inner-join size lookup, divide guard,
tie rounding) preserved and tested, every behavior that is accidental
(single-reducer cache file, tab-text intermediates, double scan) dropped.
"""

__version__ = "0.1.0"

from jaccard_mapreduce_spark.session import get_spark  # noqa: F401
