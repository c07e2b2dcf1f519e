"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2 + the
LLM-data-pipeline extensions); each callable takes (spark, sf_dir).
``oracle_sql()`` — DuckDB-equivalent ANSI SQL per query key.

Column names are aliased identically on both sides (the driver's compare
sorts columns by name before hashing). Float columns are built from exact
integer/decimal arithmetic wherever possible so value-hashes match
bit-for-bit across engines; genuinely float-accumulating ops (cosine) use
order-fixed double accumulation on both sides.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from jaccard_mapreduce_spark.operators import jaccard as J  # noqa: E402
from jaccard_mapreduce_spark.sources.corpus import read_documents  # noqa: E402

# ---------------------------------------------------------------------------
# Shared oracle SQL fragments (DuckDB dialect)
# ---------------------------------------------------------------------------

# Tokenization identical to the engine (and the reference's
# DocumentSimilarityMapper.java:80-89): lowercase, [^a-z0-9\s] -> space,
# split \s+, drop empties, per-doc dedup.
_TOK_CTE = r"""
tok AS (
    SELECT doc_id,
           unnest(list_distinct(list_filter(
               regexp_split_to_array(
                   lower(regexp_replace(text, '[^a-z0-9\s]', ' ', 'g')),
                   '\s+'),
               t -> t <> ''))) AS token
    FROM documents
)
"""

_SIZES_CTE = """
sizes AS (
    SELECT doc_id, count(*) AS size FROM tok GROUP BY doc_id
)
"""

_PAIRS_CTE = """
pairs AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS intersection
    FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
"""

_SCORED_CTE = """
scored AS (
    SELECT p.doc_a, p.doc_b, p.intersection,
           sa.size AS size_a, sb.size AS size_b,
           CASE WHEN sa.size + sb.size - p.intersection > 0
                THEN p.intersection / (sa.size + sb.size - p.intersection)
                ELSE 0.0 END AS similarity
    FROM pairs p
    JOIN sizes sa ON p.doc_a = sa.doc_id
    JOIN sizes sb ON p.doc_b = sb.doc_id
)
"""

_JACCARD_PRELUDE = f"WITH {_TOK_CTE.strip()}, {_SIZES_CTE.strip()}, {_PAIRS_CTE.strip()}, {_SCORED_CTE.strip()}"


# ---------------------------------------------------------------------------
# Query implementations
# ---------------------------------------------------------------------------


def _q_doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    return J.doc_tokens(read_documents(spark, sf_dir))


def _q_doc_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return J.doc_sizes(J.doc_tokens(read_documents(spark, sf_dir)))


def _q_pair_intersections(spark: SparkSession, sf_dir: str) -> DataFrame:
    return J.pair_intersections(J.doc_tokens(read_documents(spark, sf_dir)))


def _q_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return J.jaccard_pairs(read_documents(spark, sf_dir), strategy="auto")


def _q_jaccard_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    return J.jaccard_threshold(
        J.jaccard_pairs(read_documents(spark, sf_dir), strategy="auto"), 0.5
    )


def _q_jaccard_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    out = J.jaccard_topk(
        J.jaccard_pairs(read_documents(spark, sf_dir), strategy="auto"), 5
    )
    # row_number is int32 in Spark, int64 in DuckDB — align for schema compare
    return out.withColumn("rank", F.col("rank").cast("long"))


# ---------------------------------------------------------------------------
# Contract functions
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full all-pairs Jaccard relation on the sf0.001 corpus."""
    return J.jaccard_pairs(
        read_documents(spark, "/root/testdata/sf0.001"), strategy="auto"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "doc_tokens": _q_doc_tokens,
        "doc_sizes": _q_doc_sizes,
        "pair_intersections": _q_pair_intersections,
        "jaccard_pairs": _q_jaccard_pairs,
        "jaccard_threshold": _q_jaccard_threshold,
        "jaccard_topk": _q_jaccard_topk,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "doc_tokens": f"WITH {_TOK_CTE.strip()} SELECT doc_id, token FROM tok",
        "doc_sizes": f"WITH {_TOK_CTE.strip()}, {_SIZES_CTE.strip()} "
        "SELECT doc_id, size FROM sizes",
        "pair_intersections": f"WITH {_TOK_CTE.strip()}, {_PAIRS_CTE.strip()} "
        "SELECT doc_a, doc_b, intersection FROM pairs",
        "jaccard_pairs": f"{_JACCARD_PRELUDE} SELECT * FROM scored",
        "jaccard_threshold": f"{_JACCARD_PRELUDE} "
        "SELECT * FROM scored WHERE similarity >= 0.5",
        "jaccard_topk": f"""{_JACCARD_PRELUDE},
sym AS (
    SELECT doc_a AS doc_id, doc_b AS neighbor_id, similarity FROM scored
    UNION ALL
    SELECT doc_b AS doc_id, doc_a AS neighbor_id, similarity FROM scored
),
ranked AS (
    SELECT doc_id, neighbor_id, similarity,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY similarity DESC, neighbor_id) AS rank
    FROM sym
)
SELECT doc_id, neighbor_id, similarity, rank FROM ranked WHERE rank <= 5""",
    }
