"""Streaming decontamination ingest: a CORPUS stream scrubbed against
a fixed benchmark suite on the way in — the shape a 24/7 training-data
pipeline actually runs (the eval suite is pinned for a training run;
documents arrive continuously and must never land in the training set
carrying a benchmark quote).

The claim this face grades: contamination is PER-DOCUMENT — whether a
doc shares an n-gram with a benchmark item depends only on that doc
and the (fixed) suite, never on the rest of the corpus — so the scrub
is batch-decomposable and the union of all micro-batches' scrubbed
output must hash-match the one-shot :func:`~jaccard_mapreduce_spark.
operators.dedup.contamination_scrub` over the same corpus, whatever
the batch boundaries were. (Contrast MinHash dedup, where a doc's fate
depends on its neighbors — THAT stream face must maintain state; this
one is embarrassingly per-batch, and the grade pins exactly that.)

Cache discipline (the serve faces' recipe): the benchmark relation is
pinned ONCE by the caller — benchmark-suite-sized, the broadcast side
of every batch's audit join — while each micro-batch pins only its own
rows and releases them after the append. The ``max_bench_docs``
broadcast guard runs ONCE at wiring time, not per batch (two count
jobs per micro-batch would be the probe-factor cost paid forever)."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jaccard_mapreduce_spark.operators._cache import pin


def contamination_scrub_stream(
    stream: DataFrame,
    benchmarks: DataFrame,
    out_path: str,
    checkpoint: str,
    n: int = 8,
    min_shared: int = 1,
    max_bench_docs: int | None = 100_000,
):
    """Wire a document stream through the contamination scrub against
    a fixed ``benchmarks`` relation (pinned once by the caller),
    appending each micro-batch's SURVIVORS to ``out_path``. Returns
    the unstarted writer (the ``upsert_ivf_index_stream`` convention);
    exactly-once is NOT claimed (a replayed batch re-appends identical
    surviving rows — downstream dedup by doc_id is the recipe if the
    sink must be a set). The benchmark-side broadcast guard
    (``max_bench_docs`` — the round-11 ADVICE contract) runs here,
    once, so the per-batch sink never pays its count probes."""
    from jaccard_mapreduce_spark.operators.dedup import (
        contamination_scrub,
    )

    if max_bench_docs is not None:
        probe = benchmarks.limit(max_bench_docs + 1).count()
        if probe > max_bench_docs:
            raise ValueError(
                f"benchmarks exceeds max_bench_docs={max_bench_docs}: "
                "the benchmark side is broadcast whole per micro-batch "
                "— shrink the suite, raise the bound deliberately, or "
                "pass None after bounding it upstream"
            )

    def _sink(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        b = pin(batch_df)
        try:
            contamination_scrub(
                b,
                benchmarks,
                n=n,
                min_shared=min_shared,
                max_bench_docs=None,
            ).write.mode("append").parquet(out_path)
        finally:
            b.unpersist()

    return (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )


def stream_contamination_scrub(
    spark: SparkSession,
    sf_dir: str,
    n: int = 8,
    min_shared: int = 1,
    quote_mod: int = 50,
    start: int = 3,
    length: int = 12,
    n_input_files: int = 4,
) -> DataFrame:
    """Contract query for the streaming scrub: the corpus split across
    ``n_input_files`` files, streamed one file per trigger against the
    planted-quote benchmark suite (the batch scrub's exact fixture),
    returning the union of appended survivors — must value-hash-match
    the one-shot ``contamination_scrub`` oracle over the full corpus.
    Both branches are asserted into the result: some documents must
    survive AND some must have been scrubbed (the planted sources),
    so a sink that drops everything or scrubs nothing can't pass."""
    from jaccard_mapreduce_spark.operators.dedup import (
        planted_benchmarks,
    )
    from jaccard_mapreduce_spark.sources.corpus import read_documents
    from jaccard_mapreduce_spark.sources.vector_index import _scratch_dir

    # the FULL documents schema: the scrub passes every column through
    # (survivors keep their metadata — the ingest shape), and the
    # graded hash covers the whole row
    docs = read_documents(spark, sf_dir)
    bench = pin(
        planted_benchmarks(
            docs, quote_mod=quote_mod, start=start, length=length
        )
    )
    scratch = _scratch_dir(spark, suffix="_decontam")
    shutil.rmtree(scratch, ignore_errors=True)
    in_dir = os.path.join(scratch, "in")
    out_dir = os.path.join(scratch, "out")
    docs.repartition(n_input_files).write.parquet(in_dir)
    schema = spark.read.parquet(in_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = contamination_scrub_stream(
        stream,
        bench,
        out_dir,
        os.path.join(scratch, "ckpt"),
        n=n,
        min_shared=min_shared,
    ).start()
    q.awaitTermination()
    try:
        out = spark.read.parquet(out_dir)
        n_out, n_in = out.count(), docs.count()
        # both branches in the hash: survivors exist, and the planted
        # sources were actually scrubbed
        assert 0 < n_out < n_in, (
            f"vacuous streaming scrub: {n_out} of {n_in} docs survived"
        )
        return out
    finally:
        bench.unpersist()
