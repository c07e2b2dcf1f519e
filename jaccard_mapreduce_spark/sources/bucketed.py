"""Bucketed-table layout — the co-located join path.

At 100 TB the recurring cost of a fact-fact join is re-shuffling both
sides on the join key for every query. Hive-style bucketing amortizes
that shuffle into the WRITE: both tables are hash-partitioned into the
same number of buckets on the join key at save time, so a later
equi-join reads matching buckets pairwise and the executed plan carries
NO Exchange on either side (asserted in tests/test_plans.py). The
reference has no notion of storage layout (its only sink is a text file,
DocumentSimilarityDriver.java:43-45); this is the Spark-native answer to
its "Job 2 writes, Job 3 re-reads" materialization (SURVEY.md O12) done
usefully: materialize WITH a layout that pre-pays future shuffles.

Bucket-count guidance at scale: target ~128-512 MB per bucket file per
partition; too few buckets caps join parallelism, too many makes small
files. Bucketing also serves aggregation: a groupBy on the bucket key
plans as a partial+final agg with no exchange.
"""

from __future__ import annotations

import os
import re
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession


def demo_database_name(spark: SparkSession) -> str:
    """Session-unique catalog name for the bucketed-layout demo, derived
    from the Spark application id (unique per session by construction)."""
    app = re.sub(r"[^a-zA-Z0-9]+", "_", spark.sparkContext.applicationId)
    return f"bucketed_demo_{app}".lower()


def _demo_base_dir(spark: SparkSession) -> str:
    return os.path.join(tempfile.gettempdir(), demo_database_name(spark))


def write_bucketed_table(
    df: DataFrame,
    table: str,
    n_buckets: int,
    bucket_cols: list[str],
    sort_cols: list[str] | None = None,
) -> None:
    """Save ``df`` as a bucketed (and optionally sort-bucketed) managed
    table. Sorting within buckets additionally removes the Sort from a
    later sort-merge join — bucket files merge directly.
    """
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> DataFrame:
    """Equi-join two same-bucketed tables on their bucket key. With equal
    bucket counts the join is shuffle-free; Spark reads bucket i of both
    sides into the same task."""
    return spark.table(left_table).join(spark.table(right_table), on)


def bucketed_customer_revenue(
    spark: SparkSession, sf_dir: str, n_buckets: int = 8
) -> DataFrame:
    """Contract/demo query for the bucketed layout: write ``orders`` and
    ``customer`` bucketed by custkey, then compute per-nation order count
    and revenue through the co-located join. The DuckDB oracle is the
    PLAIN join — the layout must be semantically invisible, exactly like
    the salted-join demo (`operators/skew.py`).

    The plan payoff (no Exchange under the join) is pinned by
    ``tests/test_plans.py`` with broadcast disabled; at this dim size a
    live session may still broadcast the customer side, which is fine —
    the technique targets fact-fact joins where neither side fits.

    Storage hygiene (ADVICE r3): the database name is derived from the
    Spark application id — unique per session, so two concurrent
    sessions never race on a shared catalog name — and the warehouse
    location is DETERMINISTIC per session (not a fresh mkdtemp per
    call), cleared at the start of every invocation. A session
    therefore leaks at most one bucketed copy (the one the returned
    lazy frame still reads), instead of one per call.
    """
    from pyspark.sql import functions as F

    db = demo_database_name(spark)
    base = _demo_base_dir(spark)
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    shutil.rmtree(base, ignore_errors=True)
    spark.sql(f"CREATE DATABASE {db} LOCATION '{base}/warehouse'")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price_d"),
    )
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("custkey"), F.col("c_nationkey")
    )
    write_bucketed_table(orders, f"{db}.orders_b", n_buckets, ["custkey"])
    write_bucketed_table(
        customer, f"{db}.customer_b", n_buckets, ["custkey"]
    )
    joined = colocated_join(
        spark, f"{db}.orders_b", f"{db}.customer_b", ["custkey"]
    )
    return joined.groupBy("c_nationkey").agg(
        F.count("*").alias("n_orders"),
        F.sum("price_d").cast("double").alias("revenue"),
    )
