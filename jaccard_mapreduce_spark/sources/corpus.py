"""Corpus sources and sinks.

The reference's only source is a line-oriented text file, one document per
line, ``DocumentID <text...>`` (README.md:8; TextInputFormat at
DocumentSimilarityDriver.java:42-44). Its only sink is tab-separated text
(TextOutputFormat, Driver:45). We support both for byte-parity, plus
Parquet-first columnar documents tables (the scale path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_corpus_text(spark: SparkSession, path: str) -> DataFrame:
    """Read a reference-format corpus into ``(doc_id string, text string)``.

    Replicates the reference's silent-drop semantics as *declarative
    filters* (visible in the plan, SURVEY.md §1.3): blank lines and lines
    without a doc-id prefix are dropped (DocumentSimilarityMapper.java:19-25:
    ``firstSpace <= 0`` ⇒ skip; docId trimmed).
    """
    lines = spark.read.text(path)
    v = F.col("value")
    first_space = F.instr(v, " ")
    return (
        lines
        # O2: non-empty, well-formed (space exists and is not char 1)
        .filter((F.trim(v) != "") & (first_space > 1))
        # O3: split at first space
        .select(
            F.trim(F.substring_index(v, " ", 1)).alias("doc_id"),
            F.expr("substring(value, instr(value, ' ') + 1)").alias("text"),
        )
    )


def read_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar documents table (doc_id, text, lang, source, n_chars)."""
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


_DOC_SCHEMA = "doc_id STRING, text STRING"


def read_corpus_csv(spark: SparkSession, path: str, header: bool = True) -> DataFrame:
    """CSV corpus source with an explicit schema (never inferSchema in a
    pipeline — schema drift should fail loudly, not silently retype)."""
    return (
        spark.read.schema(_DOC_SCHEMA)
        .option("header", str(header).lower())
        .csv(path)
        .where(F.col("doc_id").isNotNull())
    )


def read_corpus_json(spark: SparkSession, path: str) -> DataFrame:
    """JSON-lines corpus source ({"doc_id": ..., "text": ...})."""
    return (
        spark.read.schema(_DOC_SCHEMA)
        .json(path)
        .where(F.col("doc_id").isNotNull())
    )


def write_documents_parquet(
    df: DataFrame, path: str, partition_by: list[str] | None = None
) -> None:
    """Parquet sink, optionally hive-partitioned (e.g. by lang/source) so
    downstream scans prune partitions on those predicates."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_formatted_text(df: DataFrame, path: str, single_file: bool = True) -> None:
    """Text sink for the formatted output relation (column ``line``).

    ``coalesce(1)`` only in golden-parity mode (single ``part-`` file like
    the reference's one-reducer run); normal mode keeps natural
    partitioning (SURVEY.md §4.3).
    """
    out = df.select(F.col("line").alias("value"))
    if single_file:
        out = out.coalesce(1)
    out.write.mode("overwrite").text(path)


def write_training_shards(
    documents: DataFrame,
    path: str,
    n_shards: int = 64,
    salt: str = "shard-v1",
    id_col: str = "doc_id",
) -> None:
    """Export the corpus as hash-balanced training shards:
    hive-partitioned parquet ``shard=K/`` directories, rows inside each
    shard in the deterministic salted-hash order (a cheap, stable global
    shuffle of the corpus — the property training-data loaders want).

    One shuffle (repartition on shard) + per-partition sort; no global
    sort. Shard count is independent of cluster parallelism, so the same
    export is reproducible on any cluster size.
    """
    from jaccard_mapreduce_spark.operators.text_analysis import shard_assign

    assignment = shard_assign(documents, n_shards, salt, id_col).select(
        F.col("doc_id").alias("_sa_doc_id"), "shard", "order_key"
    )
    (
        documents.join(
            assignment, F.col(id_col) == F.col("_sa_doc_id"), "inner"
        )
        .drop("_sa_doc_id")
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "order_key")
        .drop("order_key")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def write_documents_orc(df: DataFrame, path: str) -> None:
    """ORC sink for the documents relation — same columnar posture as
    parquet (predicate pushdown, column pruning, zlib/zstd stripes); some
    lakehouse stacks standardize on ORC, so the engine speaks both."""
    df.write.mode("overwrite").orc(path)


def read_documents_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan of a documents relation previously exported with
    ``write_documents_orc`` (schema travels in the file footer)."""
    return spark.read.orc(path)


def write_corpus_text(
    documents: DataFrame, path: str, id_col: str = "doc_id", text_col: str = "text"
) -> None:
    """Serialize a documents relation back into the reference's INPUT
    line format — ``DocumentID <text...>`` (README.md:8) — through the
    same distributed text sink the formatted output uses (O19,
    TextOutputFormat at DocumentSimilarityDriver.java:45). Natural
    partitioning: one part file per task, the cluster-scale posture."""
    out = documents.select(
        F.concat(F.col(id_col).cast("string"), F.lit(" "), F.col(text_col)).alias(
            "value"
        )
    )
    out.write.mode("overwrite").text(path)


def corpus_text_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract query closing the O1/O19 grading gap: the text SINK and
    the text SCAN, exercised in-contract. Writes the documents table as
    reference-format lines (:func:`write_corpus_text`), re-reads it
    through the O1–O3 scan/filter/split chain (:func:`read_corpus_text`),
    and grades one integer row —
    ``(surface, n_rows, n_id_mismatch, n_text_mismatch)`` — with the
    mismatch counters pinned to zero by the oracle (the
    ``formats_roundtrip`` recipe applied to the reference's own text
    format). A full outer join on doc_id makes dropped OR invented rows
    show up as id mismatches, not silent count drift."""
    import os
    import re as _re
    import shutil
    import tempfile

    app = _re.sub(r"[^a-zA-Z0-9]+", "_", spark.sparkContext.applicationId)
    base = os.path.join(tempfile.gettempdir(), f"corpus_text_{app}".lower())
    shutil.rmtree(base, ignore_errors=True)

    orig = read_documents(spark, sf_dir).select("doc_id", "text")
    write_corpus_text(orig, base)
    back = read_corpus_text(spark, base).select(
        F.col("doc_id").cast("bigint").alias("doc_id"), "text"
    )
    a = orig.alias("a")
    b = back.alias("b")
    joined = a.join(b, F.col("a.doc_id") == F.col("b.doc_id"), "full")
    miss = (
        F.col("a.doc_id").isNull() | F.col("b.doc_id").isNull()
    ).cast("long")
    return joined.agg(
        F.lit("corpus_text").alias("surface"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(miss).alias("n_id_mismatch"),
        F.sum(
            (~F.col("a.text").eqNullSafe(F.col("b.text"))).cast("long")
        ).alias("n_text_mismatch"),
    )
