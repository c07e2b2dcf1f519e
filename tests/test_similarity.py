"""Similarity-search operator tests."""

from __future__ import annotations

import math

import pytest

from jaccard_mapreduce_spark.operators import similarity as S


@pytest.fixture(scope="module")
def emb(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0, 0.0]),   # close to 1
        (3, [0.0, 1.0, 0.0, 0.0]),   # orthogonal to 1
        (4, [-1.0, 0.0, 0.0, 0.0]),  # opposite of 1
        (5, [0.0, 0.0, 0.0, 0.0]),   # zero vector -> guarded score 0.0
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    return df.selectExpr("vec_id", "transform(embedding, x -> CAST(x AS FLOAT)) AS embedding")


def test_cosine_pairs_values(spark, emb):
    got = {
        (r["query_id"], r["neighbor_id"]): r["score"]
        for r in S.cosine_pairs(emb).collect()
    }
    assert got[(1, 2)] == pytest.approx(0.9 / math.sqrt(0.9**2 + 0.1**2))
    assert got[(1, 3)] == pytest.approx(0.0)
    assert got[(1, 4)] == pytest.approx(-1.0)
    assert got[(1, 5)] == 0.0  # zero-vector guard
    assert got[(5, 1)] == 0.0


def test_cosine_topk_ranks(spark, emb):
    got = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in S.cosine_topk(emb, k=2).collect()
    }
    assert got[(1, 1)] == 2  # nearest to 1 is 2
    assert got[(2, 1)] == 1
    # every query gets exactly k rows (n-1 >= k here)
    assert len(got) == 5 * 2


def test_lsh_topk_subset_of_exact(spark, emb):
    # LSH results are a subset of the brute-force pair set with identical
    # scores (recall loss only, no score distortion)
    exact = {
        (r["query_id"], r["neighbor_id"]): r["score"]
        for r in S.cosine_pairs(emb).collect()
    }
    # 2 planes -> coarse buckets so the tiny fixture yields candidates
    approx = S.ann_lsh_topk(emb, k=4, n_planes=2, dim=4).collect()
    assert len(approx) > 0
    for r in approx:
        assert exact[(r["query_id"], r["neighbor_id"])] == r["score"]


def test_embedding_duplicates(spark, emb):
    got = {(r["vec_a"], r["vec_b"]) for r in S.embedding_duplicates(emb, 0.9).collect()}
    assert got == {(1, 2)}
