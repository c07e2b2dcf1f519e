"""Partitioned-table layout — the partition-pruning path.

Sibling of the bucketed-layout demo (``sources/bucketed.py``): where
bucketing pre-pays JOIN shuffles, directory partitioning pre-pays
SCAN cost. A table written ``partitionBy(k)`` stores one directory per
key value, and a filter on ``k`` prunes whole directories at planning
time — the scan never opens the excluded files. At 100 TB this is the
difference between reading one week and reading three years; every
serious time-series layout partitions on a coarse time key. The
reference has no storage-layout notion at all (its only sink is one
text file, DocumentSimilarityDriver.java:43-45); this is the
Spark-native answer on the read path.

Partition-key guidance at scale: pick a key with bounded cardinality
(day, not timestamp; hundreds-to-thousands of directories, not
millions) and combine with in-file sorting or bucketing for secondary
keys — over-partitioning makes small files and kills the scan.
"""

from __future__ import annotations

import os
import re
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def demo_dir(spark: SparkSession) -> str:
    """Deterministic per-session location for the partitioned copy —
    unique per Spark application (no cross-session collisions), reused
    within a session so repeated invocations leak at most one copy
    (same hygiene contract as the bucketed demo)."""
    app = re.sub(r"[^a-zA-Z0-9]+", "_", spark.sparkContext.applicationId)
    return os.path.join(tempfile.gettempdir(), f"events_part_demo_{app}".lower())


def write_partitioned_events(
    spark: SparkSession, sf_dir: str, base: str
) -> None:
    """Write the events table re-laid-out as one directory per
    day-of-month (``d=1..31``). Day-of-month (not the full date) keeps
    the demo stable under regenerated test data while exercising the
    identical pruning machinery."""
    from jaccard_mapreduce_spark.sources.tables import load_events

    events = load_events(spark, sf_dir).withColumn(
        "d", F.dayofmonth("ts")
    )
    events.write.mode("overwrite").partitionBy("d").parquet(base)


def partitioned_events_summary(
    spark: SparkSession,
    sf_dir: str,
    day_lo: int = 8,
    day_hi: int = 14,
) -> DataFrame:
    """Contract/demo query for the partitioned layout: write events
    partitioned by day-of-month, then aggregate one week through the
    pruned scan (per event type: row count, distinct users, exact
    decimal value sum). The DuckDB oracle filters the PLAIN table with
    ``day(ts) BETWEEN`` — the layout must be semantically invisible,
    exactly like the bucketed and salted demos.

    The plan payoff is pinned by ``tests/test_plans.py``: the day
    predicate appears under ``PartitionFilters`` (directory pruning at
    planning time), not as a post-scan filter.
    """
    base = demo_dir(spark)
    shutil.rmtree(base, ignore_errors=True)
    write_partitioned_events(spark, sf_dir, base)
    part = spark.read.parquet(base)
    return (
        part.where((F.col("d") >= day_lo) & (F.col("d") <= day_hi))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
    )
