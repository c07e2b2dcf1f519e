"""Incremental Jaccard scoring over a document stream.

``foreachBatch`` pattern: each micro-batch of new documents is tokenized,
appended to a distributed token-state directory (parquet; a production
deployment would use Delta/Iceberg for atomic appends), and scored
against the full accumulated corpus — new-vs-all pairs only, never
recomputing old-vs-old. This is the streaming analog of the reference's
batch pipeline: the same ``jaccard_from_tokens`` machinery applied to the
(new × all) frontier.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jaccard_mapreduce_spark.operators.jaccard import doc_sizes, doc_tokens


class IncrementalJaccard:
    """Accumulates token state and emits new-pair scores per micro-batch."""

    def __init__(self, spark: SparkSession, state_dir: str, out_dir: str):
        self.spark = spark
        self.state_dir = state_dir
        self.out_dir = out_dir

    def _score_new(self, new_tokens: DataFrame, all_tokens: DataFrame) -> DataFrame:
        """Pairs touching at least one NEW doc (new×all co-occurrence)."""
        sizes = doc_sizes(all_tokens)
        a = new_tokens.alias("a")
        b = all_tokens.alias("b")
        # new×all emits a shared token once per NEW side — when both docs
        # of a pair are new the same (pair, token) arrives twice, so dedup
        # before counting
        cand = (
            a.join(b, "token")
            .where(F.col("a.doc_id") != F.col("b.doc_id"))
            .select(
                F.least("a.doc_id", "b.doc_id").alias("doc_a"),
                F.greatest("a.doc_id", "b.doc_id").alias("doc_b"),
                "token",
            )
            .distinct()
            .groupBy("doc_a", "doc_b")
            .agg(F.count("*").alias("intersection"))
        )
        sa = F.broadcast(sizes).alias("sa")
        sb = F.broadcast(sizes).alias("sb")
        union = F.col("size_a") + F.col("size_b") - F.col("intersection")
        return (
            cand.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
            .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
            .select(
                "doc_a",
                "doc_b",
                "intersection",
                F.col("sa.size").alias("size_a"),
                F.col("sb.size").alias("size_b"),
            )
            .withColumn(
                "similarity",
                F.when(union > 0, F.col("intersection") / union).otherwise(F.lit(0.0)),
            )
        )

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        new_tokens = doc_tokens(batch_df)
        new_tokens.write.mode("append").parquet(self.state_dir)
        all_tokens = self.spark.read.parquet(self.state_dir)
        scores = self._score_new(new_tokens, all_tokens)
        scores.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            self.out_dir
        )

    def attach(self, doc_stream: DataFrame):
        """Attach to a streaming documents DataFrame; returns the query."""
        os.makedirs(self.state_dir, exist_ok=True)
        return (
            doc_stream.writeStream.outputMode("append")
            .foreachBatch(self.process_batch)
            .start()
        )
