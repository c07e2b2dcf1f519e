"""Round-12 optimization: the hash-exact vectorized kernels must be
BIT-identical to the interpreted-expression forms they replaced.

The optimization round rewired every exact-tier ANN path through
numpy kernels whose float accumulation reproduces the sequential
``F.aggregate(zip_with(...))`` fold order (and whose integer folds are
order-free). These tests pin that equivalence directly against the
legacy expression forms, so a future kernel edit that drifts by one
ulp fails here rather than in a driver hash mismatch.
"""

import os

import pytest
from pyspark.sql import functions as F

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


def _rows(df):
    """Fully-materialized rows with float bit patterns (so a one-ulp
    drift is a test failure, not a tolerance pass)."""
    import struct

    def canon(v):
        if isinstance(v, float):
            return struct.pack("<d", v)
        return v

    return sorted(
        tuple(canon(v) for v in r) for r in df.collect()
    )


def test_fold_kernel_equals_relational_exact_cosine(spark):
    """cosine_topk (bucket-local fold kernel) == the legacy relational
    broadcast-join + interpreted `_dot` + full window plan, bitwise."""
    from jaccard_mapreduce_spark.operators.similarity import (
        _topk,
        cosine_pairs,
        cosine_topk,
    )

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    got = cosine_topk(emb, k=7)
    want = _topk(cosine_pairs(emb), 7)
    assert _rows(got) == _rows(want)


def test_sq8_kernel_equals_expression_scores(spark):
    """The cell-local SQ8 kernel's scores == `_sq8_pair_score` over the
    relational cell join, bitwise, for the full (unpruned) pair set."""
    from jaccard_mapreduce_spark.operators.similarity import (
        _score_cell_sq8_local,
        _sq8_enrich,
        _sq8_pair_score,
        _sq8_role_union,
        ivf_assign,
        ivf_centroids,
        vectors,
    )

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    cents = ivf_centroids(emb, 8)
    enriched = ivf_assign(_sq8_enrich(vectors(emb)), cents, 4)
    enriched.persist().count()
    try:
        got = _score_cell_sq8_local(
            _sq8_role_union(enriched, with_exact=True),
            "bigint",
            with_exact=True,
        ).select("query_id", "neighbor_id", "score_sq8", "score_exact")
        a = enriched.alias("a")
        b = enriched.where(F.col("crank") == 1).alias("b")
        from jaccard_mapreduce_spark.operators.similarity import (
            _cosine,
            _dot,
        )

        want = a.join(
            b,
            (F.col("a.cell_id") == F.col("b.cell_id"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        ).select(
            F.col("a.vec_id").alias("query_id"),
            F.col("b.vec_id").alias("neighbor_id"),
            _sq8_pair_score().alias("score_sq8"),
            _cosine(
                _dot(F.col("a.vec"), F.col("b.vec")),
                F.col("a.norm2"),
                F.col("b.norm2"),
            ).alias("score_exact"),
        )
        assert _rows(got) == _rows(want)
    finally:
        enriched.unpersist()


def test_lsh_sigs_kernel_equals_expression(spark):
    """Kernel signature strings == the `_lsh_signature_expr` SQL form
    for every vector and table."""
    from jaccard_mapreduce_spark.operators.similarity import (
        _lsh_signature_expr,
        _lsh_sigs_kernel,
        lsh_tables,
        vectors,
    )

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    v = vectors(emb)
    tables = lsh_tables(64, 5, 7, seed=11)
    got = _lsh_sigs_kernel(v, tables).select("vec_id", "sigs")
    sig_array = ", ".join(
        _lsh_signature_expr("vec", planes) for planes in tables
    )
    want = v.select(
        "vec_id", F.expr(f"array({sig_array})").alias("sigs")
    )
    assert _rows(got) == _rows(want)


def test_ivf_assign_kernel_equals_relational(spark, monkeypatch):
    """The mapInPandas assignment == the crossJoin + rank-window plan
    (forced via the codebook-size fallback), bitwise, including the
    crank tie-order."""
    import jaccard_mapreduce_spark.operators.similarity as S

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    cents = S.ivf_centroids(emb, 16)
    v = S.vectors(emb)
    got = S.ivf_assign(v, cents, 5).select(
        "vec_id", "vec", "norm2", "cell_id", "crank"
    )
    monkeypatch.setattr(S, "MAX_LOCAL_CODEBOOK", 0)
    want = S.ivf_assign(v, cents, 5).select(
        "vec_id", "vec", "norm2", "cell_id", "crank"
    )
    assert _rows(got) == _rows(want)


def test_codes_assignment_kernel_matches_python_reference(spark):
    """Integer k-means assignment: kernel == a from-scratch Python
    argmin with the lowest-cluster-id tie-break."""
    from jaccard_mapreduce_spark.operators.similarity import (
        _codes_assignment,
        _int8_codes,
    )

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    q = _int8_codes(emb, "vec_id", "embedding")
    rows = {r["vec_id"]: list(r["q"]) for r in q.collect()}
    ids = sorted(rows)[:4]
    codebook = [(i, rows[vid]) for i, vid in enumerate(ids)]
    got = {
        r["vec_id"]: (r["cluster"], r["dist"])
        for r in _codes_assignment(q, codebook).collect()
    }
    for vid, code in rows.items():
        dists = [
            (sum((a - b) ** 2 for a, b in zip(code, cvec)), cid)
            for cid, cvec in codebook
        ]
        best = min(dists)
        assert got[vid] == (best[1], best[0])
