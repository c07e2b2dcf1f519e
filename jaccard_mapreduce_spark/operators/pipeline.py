"""End-to-end training-corpus preparation — the flagship composition.

One declarative plan that chains the individual operators a real
LLM-data pipeline runs in sequence:

    quality gate  →  exact dedup  →  near-dup (MinHash-LSH) clustering
    → canonical-representative selection  →  deterministic global
    shuffle  →  fixed-length sequence packing

The reference engine runs one fixed 3-job pipeline
(DocumentSimilarityDriver.java:29-94); this operator is the same idea at
the scale tier the engine targets: the stages stay individually
auditable (each is its own tested, oracle-backed operator) while Spark
fuses the composition into one lazy plan — no intermediate files, no
per-stage driver round-trips except where an iterative algorithm
(connected components) genuinely needs them.

Scale shape: the three survivor relations are pinned (each feeds 2+
consumers); everything else is the operators' own documented plans. The
output is one row per surviving document with its pack/shard/shuffle
coordinates — exactly what a downstream tokenizer-writer consumes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jaccard_mapreduce_spark.operators._cache import pin
from jaccard_mapreduce_spark.operators.dedup import (
    dedup_clusters,
    dedup_representatives,
    exact_duplicates,
    minhash_lsh_dedup,
)
from jaccard_mapreduce_spark.operators.text_analysis import (
    global_shuffle,
    pack_sequences,
    quality_keep,
)


def prepare_corpus(
    documents: DataFrame,
    min_quality: float = 0.5,
    min_tokens: int = 10,
    dedup_threshold: float = 0.7,
    max_len: int = 2048,
    n_shards: int = 16,
    pack_salt: str = "pack-v1",
    shuffle_salt: str = "shuffle-v1",
) -> DataFrame:
    """Full corpus-preparation pipeline; returns one row per surviving
    document: ``(doc_id, shard, n_tokens, start_offset, pack_id,
    shuffle_pos)``.

    Survivorship: a doc survives if it (1) passes the quality gate,
    (2) is its exact-duplicate group's keeper, and (3) is its near-dup
    cluster's representative (largest ``n_chars``, ties → lowest id,
    clusters from MinHash-LSH pairs at ``dedup_threshold``).
    """
    # project to the three columns the pipeline touches BEFORE the first
    # pin: the survivor relations are cached and re-read repeatedly, and
    # the parquet scan prunes to 3 columns (plan-audited)
    documents = documents.select("doc_id", "text", "n_chars")
    # quality gate as an in-place filter: the score is a pure projection,
    # so filtering directly costs one scan — no score relation to join
    # back. (The exact-dedup stage below keeps its join-back form on
    # purpose: its keeper choice needs a shuffle either way, and joining
    # the skinny id list back beats shuffling the full text column.)
    kept1 = pin(documents.where(quality_keep(min_quality, min_tokens)))
    e = exact_duplicates(kept1)
    kept2 = pin(
        kept1.join(e.where(~F.col("is_dup")).select("doc_id"), "doc_id")
    )
    clusters = dedup_clusters(
        kept2.select("doc_id"),
        minhash_lsh_dedup(kept2, threshold=dedup_threshold),
    )
    reps = dedup_representatives(kept2, clusters)
    kept3 = pin(
        kept2.join(reps.where(F.col("is_kept")).select("doc_id"), "doc_id")
    )
    sh = global_shuffle(kept3, salt=shuffle_salt)
    pk = pack_sequences(
        kept3, max_len=max_len, n_shards=n_shards, salt=pack_salt
    )
    return pk.join(sh.select("doc_id", "shuffle_pos"), "doc_id")


def prepare_corpus_rules(
    documents: DataFrame,
    min_words: int = 25,
    max_symbol_ratio: float = 0.1,
    **prepare_kwargs,
) -> DataFrame:
    """The flagship pipeline with the round-4 RULE tier as a pre-gate:

        Gopher rule flags  →  (everything :func:`prepare_corpus` runs)

    Rule-based filtering runs FIRST in production pipelines — it is the
    cheapest stage (pure projections) and the score-based gate,
    dedup and packing then never touch rule-rejected docs at all. The
    pre-gate is an in-place filter expression (the ``quality_keep``
    convention — the rules are pure projections, so no flag relation
    to join back); ``min_words=25`` is deliberately stricter than
    the Gopher default so the gate demonstrably bites on the test
    corpus (drops ~15% of docs at sf0.01) while the downstream
    pipeline still has a meaningful survivor set to verify.
    """
    from jaccard_mapreduce_spark.operators.text_analysis import gopher_keep

    # in-place filter (the quality_keep convention): the rules are pure
    # projections, so gating costs one scan — the flag-projection +
    # join-back form measured +2.4 s at sf0.1 for zero semantic gain
    kept0 = documents.where(
        gopher_keep(min_words=min_words, max_symbol_ratio=max_symbol_ratio)
    )
    return prepare_corpus(kept0, **prepare_kwargs)
