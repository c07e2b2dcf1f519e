"""Runtime bloom-filter join pruning — the scan-side sibling of AQE.

When one join side carries a selective filter, Spark (3.4+) can build a
bloom filter over the filtered side's join keys at RUNTIME and inject a
``might_contain`` predicate into the other side's scan — rows whose
keys cannot possibly match are dropped at the scan, before the shuffle.
At 100 TB this is the difference between shuffling the whole fact table
and shuffling only the ~selectivity fraction that can survive the join:
the reference's fixed pipeline has no notion of cross-relation pruning
at all (every Hadoop job reads its full input,
DocumentSimilarityDriver.java:29-94).

The feature is conf-gated by size thresholds tuned for clusters
(application side > 10 GB by default), so the demo pins the thresholds
inside a save/restore scope rather than mutating the session — and
forces the sort-merge path, because at the test scale Catalyst would
otherwise broadcast the dimension side (at fact-fact scale, where
neither side broadcasts, the bloom filter is exactly the win).

The technique must be semantically invisible: the DuckDB oracle runs
the plain filtered join (same contract as the salted, bucketed, and
partitioned demos).
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_D = "decimal(18,2)"

# thresholds that let the runtime filter fire at any input size; the
# feature flag itself is on by default in Spark 3.4+
BLOOM_DEMO_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    # force the SMJ path the technique targets (fact-fact joins)
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@contextmanager
def bloom_scope(spark: SparkSession):
    """Apply the demo confs, restoring previous values on exit. The
    caller must force planning (an action or localCheckpoint) INSIDE
    the scope — Spark plans lazily, so a frame returned un-materialized
    would be planned under the restored confs."""
    saved: dict[str, str | None] = {}
    for k, v in BLOOM_DEMO_CONFS.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def urgent_order_revenue(
    lineitem: DataFrame, orders: DataFrame, priority: str = "1-URGENT"
) -> DataFrame:
    """Per-return-flag item count and revenue for line items of
    one order priority — the selective orders filter is what the
    runtime bloom filter propagates into the lineitem scan."""
    rev = F.col("l_extendedprice").cast(_D) * (
        F.expr("CAST(1 AS DECIMAL(3,2))") - F.col("l_discount").cast(_D)
    )
    return (
        lineitem.join(
            orders.where(F.col("o_orderpriority") == priority).select(
                "o_orderkey"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(rev).cast("double").alias("revenue"),
        )
    )


def bloom_pruned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract/demo query: run ``urgent_order_revenue`` with the
    runtime bloom filter active and return the materialized result
    (localCheckpoint inside the scope — see ``bloom_scope``). The
    ``might_contain`` injection is plan-asserted in tests/test_plans.py."""
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    with bloom_scope(spark):
        return urgent_order_revenue(lineitem, orders).localCheckpoint(
            eager=True
        )
