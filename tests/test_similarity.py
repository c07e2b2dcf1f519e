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


def test_ivf_topk_structure_and_recall(spark):
    # 20 vectors in two tight clusters around e1 and e2 -> IVF with 2+
    # cells must recover in-cluster neighbors (they share a cell)
    rows = []
    for i in range(10):
        rows.append((i, [10.0, float(i) * 0.01, 0.0, 0.0]))
    for i in range(10, 20):
        rows.append((i, [0.0, 10.0, float(i) * 0.01, 0.0]))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"]).selectExpr(
        "vec_id", "transform(embedding, x -> CAST(x AS FLOAT)) AS embedding"
    )
    got = S.ann_ivf_topk(emb, k=3, n_cells=4, n_probe=2).collect()
    by_query: dict[int, list] = {}
    for r in got:
        by_query.setdefault(r["query_id"], []).append(r)
    for q, neigh in by_query.items():
        ranks = sorted(r["rank"] for r in neigh)
        assert ranks == list(range(1, len(ranks) + 1))
        ordered = sorted(neigh, key=lambda r: r["rank"])
        scores = [r["score"] for r in ordered]
        assert scores == sorted(scores, reverse=True)
        # in-cluster neighbors score ~1; top hit must be same-cluster
        same_cluster = (q < 10) == (ordered[0]["neighbor_id"] < 10)
        assert same_cluster
        assert ordered[0]["score"] > 0.99


def test_cosine_topk_fast_refuses_oversized_index(spark):
    from jaccard_mapreduce_spark.operators.similarity import cosine_topk_fast

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    with pytest.raises(ValueError, match="ann_lsh_topk"):
        cosine_topk_fast(emb, k=3, max_index_rows=10)


def test_quantize_embeddings_roundtrip(spark):
    from jaccard_mapreduce_spark.operators.similarity import quantize_embeddings

    rows = [
        (1, [0.0, 0.5, 1.0]),
        (2, [-2.0, 0.0, 2.0]),
        (3, [7.0, 7.0, 7.0]),   # constant vector -> scale 0
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    assert got[1]["qvec"] == [-128, 0, 127]
    assert got[2]["qvec"] == [-128, 0, 127]
    assert got[3]["qvec"] == [-128, -128, -128] and got[3]["scale"] == 0.0
    # dequantized reconstruction error bounded by scale/2
    for vec_id, orig in rows:
        r = got[vec_id]
        for q, x in zip(r["qvec"], orig):
            approx = (q + 128) * r["scale"] + r["zero_point"]
            assert abs(approx - x) <= r["scale"] / 2 + 1e-12
