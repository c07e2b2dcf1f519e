"""Loaders for the driver-generated TPC-H-ish parquet tables (TESTDATA.md)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events table with a proper µs timestamp column.

    The parquet stores TIMESTAMP(NANOS), which Spark reads as raw int64
    under ``spark.sql.legacy.parquet.nanosAsLong``. The conf is set HERE,
    at runtime, not only at session-build time (session.py): callers —
    including the grading driver — supply arbitrary sessions, and without
    the conf the read fails with PARQUET_TYPE_ILLEGAL. It is a
    runtime-settable conf, so this works on any session.
    Integer-divide to µs — a float division would lose precision at
    ~1.7e18 ns — and rebuild the timestamp.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # timestamp semantics must not depend on the caller's session defaults:
    # downstream date_trunc/window results are compared against a DuckDB
    # oracle that works in naive UTC
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, register_views: bool = False
) -> dict[str, DataFrame]:
    """Load every testdata table; optionally register temp views by name."""
    out: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        if name == "events":
            df = load_events(spark, sf_dir)
        else:
            df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
