"""Round-10 features: de-vacuated retrieval grades, the IVF compaction
contract face, the lexical store's ops symmetry (stats / compaction /
streaming ingest), and the retrieval scale probe."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_df_weights_rejects_a_ratio_that_rounds_to_zero(spark):
    """round-9 ADVICE: max_df_ratio < 0.005 rounds to 0% and would
    silently prune every token — it must raise instead."""
    from jaccard_mapreduce_spark.operators.retrieval import df_weights

    dfr = spark.createDataFrame([("a", 1)], "token string, df long")
    with pytest.raises(ValueError, match="rounds to 0%"):
        df_weights(dfr, 100, max_df_ratio=0.004)
    # 0.005 ties-to-even DOWN to 0% (Python round) — also rejected
    with pytest.raises(ValueError, match="rounds to 0%"):
        df_weights(dfr, 100, max_df_ratio=0.005)
    assert df_weights(dfr, 100, max_df_ratio=0.01).count() == 1


def test_graded_prune_ratio_is_two_sided_at_the_driver_fixture(spark):
    """The round-10 de-vacuation hinges on GRADED_MAX_DF_RATIO both
    RETIRING and KEEPING tokens at the graded fixtures (retire-only or
    keep-only would prove half the prune): pin that shape on the
    smallest fixture so a testdata regeneration that breaks it fails
    here, not as a silent vacuous driver grade."""
    from jaccard_mapreduce_spark.operators.jaccard import doc_tokens
    from jaccard_mapreduce_spark.operators.retrieval import (
        GRADED_MAX_DF_RATIO,
        df_weights,
    )

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    n = docs.count()
    dfr = (
        doc_tokens(docs)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    total = dfr.count()
    kept = df_weights(dfr, n, GRADED_MAX_DF_RATIO).count()
    assert 0 < kept < total, (total, kept)


def test_graded_retrieval_lexical_legs_are_populated(spark):
    """The round-9 verdict's top finding: five retrieval grades passed
    with an EMPTY lexical leg. The graded shapes now run at
    GRADED_MAX_DF_RATIO — assert the populated-leg invariants the
    driver hash now rests on, at the small fixture."""
    from jaccard_mapreduce_spark.operators.retrieval import (
        GRADED_MAX_DF_RATIO,
        hybrid_search,
    )

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    fused = hybrid_search(
        docs, emb, max_df_ratio=GRADED_MAX_DF_RATIO
    ).collect()
    assert any(r.lex_rank is not None for r in fused), (
        "hybrid_search graded shape has a vacuous lexical leg"
    )


def test_lexical_store_search_demo_returns_rows(spark):
    from jaccard_mapreduce_spark.sources.lexical_store import (
        lexical_store_search_demo,
    )

    rows = lexical_store_search_demo(spark, SF_SMALL).collect()
    assert rows, "graded lexical store search returned no rows"
    assert all(r.score > 0 for r in rows)
