"""SQL surface: register the base tables AND the engine's derived
relations as temp views, so the whole operator inventory is queryable
with plain ``spark.sql(...)``.

The reference has no SQL layer (SURVEY.md §3 — one hard-wired DAG); this
is the engine's upgrade path: every derived view is the same lazy
DataFrame the Python API returns, so Catalyst optimizes user SQL over
them exactly like composed DataFrame calls (view expansion + pushdown —
a filter on ``jaccard_pairs`` prunes inside the pair plan).

    >>> register_all(spark, "/root/testdata/sf0.01")
    >>> spark.sql("SELECT * FROM jaccard_pairs WHERE similarity > 0.9")
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from jaccard_mapreduce_spark.operators import dedup as D
from jaccard_mapreduce_spark.operators import jaccard as J
from jaccard_mapreduce_spark.operators import similarity as S
from jaccard_mapreduce_spark.operators import text_analysis as TA
from jaccard_mapreduce_spark.sources.corpus import read_documents
from jaccard_mapreduce_spark.sources.tables import load_tables


def register_tables(spark: SparkSession, sf_dir: str) -> list[str]:
    """Temp views for the raw tables (region ... embeddings)."""
    return sorted(load_tables(spark, sf_dir, register_views=True).keys())


def register_derived(spark: SparkSession, sf_dir: str) -> list[str]:
    """Temp views for the engine's derived relations."""
    docs = read_documents(spark, sf_dir)
    tokens = J.doc_tokens(docs)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    derived = {
        "doc_tokens": tokens,
        "doc_sizes": J.doc_sizes(tokens),
        "jaccard_pairs": J.jaccard_pairs(docs, strategy="auto"),
        "text_stats": TA.text_stats(docs),
        "doc_fingerprints": TA.fingerprints(docs),
        "doc_splits": TA.doc_split(docs),
        "exact_duplicates": D.exact_duplicates(docs),
        "minhash_signatures": D.minhash_signatures(tokens),
        "simhash_fingerprints": D.simhash(tokens),
        "embedding_vectors": S.vectors(emb),
        # round-2 training-pipeline views (prepare_corpus is deliberately
        # NOT a view: its connected-components stage runs driver-side
        # iterations eagerly, the wrong cost model for view registration)
        "quality_scores": TA.quality_filter(docs),
        "contamination": TA.contamination_check(docs),
        "corpus_top_ngrams": TA.top_ngrams(docs),
        "training_order": TA.global_shuffle(docs),
    }
    for name, df in derived.items():
        df.createOrReplaceTempView(name)
    return sorted(derived)


def register_all(spark: SparkSession, sf_dir: str) -> list[str]:
    """Tables + derived relations; returns all registered view names."""
    return register_tables(spark, sf_dir) + register_derived(spark, sf_dir)
