"""foreachBatch keyed-snapshot upsert — the exactly-once CDC file sink.

The reference's only sink is an append-only text file
(DocumentSimilarityDriver.java:43-45); a streaming engine also needs
the OTHER canonical sink: a keyed snapshot that each micro-batch
UPSERTS (latest row per key), maintained idempotently so batch replays
after a failure cannot corrupt it. Without a transactional table
format, the classic pattern is versioned snapshot directories:

    snap_v{b} = latest_per_key( snap_v{b-1} ∪ batch_b )

Each version is written whole to its own path, so re-running batch
``b`` (Structured Streaming replays the last uncommitted batch after
recovery) deterministically rewrites ``snap_v{b}`` from the same
inputs — the effect on the final state is exactly-once even though the
delivery is at-least-once. At 100 TB the same recipe holds with
partition-overwrite (only key-hash partitions touched by the batch are
rewritten) or a table format with commit atomicity; the plan shape —
one keyed max-struct aggregate per batch over snapshot ∪ delta — is
identical.

The contract query splits the events table into N input files and
streams them with ``maxFilesPerTrigger=1`` (N genuine micro-batches,
arrival order = file listing order), then reads the final snapshot
back; the oracle is the exact batch latest-event SQL, so the grade
proves the multi-batch fold converges to the batch answer regardless
of how rows were split across batches.

Storage hygiene: session-derived scratch dir, cleared at invocation
start (the bucketed-demo convention); only the final snapshot version
remains referenced by the returned frame.
"""

from __future__ import annotations

import os
import re
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _scratch_dir(spark: SparkSession) -> str:
    app = re.sub(r"[^a-zA-Z0-9]+", "_", spark.sparkContext.applicationId)
    return os.path.join(tempfile.gettempdir(), f"upsert_demo_{app}".lower())


def _latest_per_user(df: DataFrame) -> DataFrame:
    """Keyed keep-latest fold: max event-time row per user. Ties on ts
    cannot occur in the events table (unique µs stamps), matching the
    batch oracle's plain ts max."""
    m = F.max(
        F.struct("last_ts_us", "last_value", "last_event_type")
    ).alias("m")
    return (
        df.groupBy("user_id")
        .agg(m)
        .select(
            "user_id",
            F.col("m.last_ts_us").alias("last_ts_us"),
            F.col("m.last_value").alias("last_value"),
            F.col("m.last_event_type").alias("last_event_type"),
        )
    )


def stream_upsert_snapshot(
    spark: SparkSession, sf_dir: str, n_input_files: int = 8
) -> DataFrame:
    """Run the upsert pipeline to completion and return the final
    snapshot ``(user_id, last_ts_us, last_value, last_event_type)``."""
    from jaccard_mapreduce_spark.sources.tables import load_events

    base = _scratch_dir(spark)
    shutil.rmtree(base, ignore_errors=True)
    in_dir = os.path.join(base, "in")
    snap_dir = os.path.join(base, "snap")

    events = load_events(spark, sf_dir).select(
        "user_id", "ts", "value", "event_type"
    )
    events.repartition(n_input_files).write.parquet(in_dir)
    schema = spark.read.parquet(in_dir).schema

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        delta = batch_df.select(
            "user_id",
            F.unix_micros("ts").alias("last_ts_us"),
            F.col("value").alias("last_value"),
            F.col("event_type").alias("last_event_type"),
        )
        # The previous snapshot comes from DISK, keyed by the stable
        # batch_id — not from driver memory. After a driver restart
        # Structured Streaming replays the last uncommitted batch b with
        # the SAME batch_id, so v{b} is deterministically rebuilt from
        # v{b-1} ∪ batch_b — the idempotent-replay property holds across
        # real recoveries, not just within one driver process.
        prev = os.path.join(snap_dir, f"v{batch_id - 1}")
        if os.path.exists(prev):
            delta = delta.unionByName(batch_df.sparkSession.read.parquet(prev))
        out = os.path.join(snap_dir, f"v{batch_id}")
        _latest_per_user(delta).write.mode("overwrite").parquet(out)

    q = (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", os.path.join(base, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    versions = [
        int(d[1:])
        for d in os.listdir(snap_dir)
        if re.fullmatch(r"v\d+", d)
    ] if os.path.isdir(snap_dir) else []
    assert versions, "stream produced no batches"
    return spark.read.parquet(os.path.join(snap_dir, f"v{max(versions)}"))
