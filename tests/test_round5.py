"""Round-5 additions: the formatted-output tier's tie rounding, the
LSH-pruned containment variant, and the non-vacuous q22 predicate.

The tie-rounding test is the unit-level backstop behind the
``jaccard_formatted`` contract entry: Spark's ``format_string('%.2f')``
(Java HALF_UP on the shortest decimal repr, DocumentSimilarityReducer
.java:105-107) must equal the oracle's integer emulation
``pct = (200*I + U) div (2*U)`` on exact ``.xx5`` ties and everywhere
else (operators/jaccard.py::jaccard_formatted).
"""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from jaccard_mapreduce_spark.operators import dedup as D
from jaccard_mapreduce_spark.operators import jaccard as J

from tests.conftest import SF_ORACLE, SF_SMALL


# (intersection, union) pairs: the three golden-dataset .xx5 ties, a
# binary-exact tie, non-terminating rationals, and the boundaries
_TIE_CASES = [
    (9, 200), (15, 200), (21, 200),   # shortest-repr ".xx5" ties (golden)
    (1, 8), (3, 8), (123, 200),       # more exact-decimal ties
    (1, 3), (2, 3), (1, 7),           # non-terminating, no tie
    (1, 2), (0, 5), (7, 7),           # .50 / zero / 1.00
]


def _pct_emulated(i: int, u: int) -> str:
    pct = (200 * i + u) // (2 * u) if u > 0 else 0
    return f"{pct // 100}.{pct % 100:02d}"


def test_format_string_matches_integer_halfup_emulation(spark):
    rows = [(i, u) for i, u in _TIE_CASES]
    df = spark.createDataFrame(rows, "i long, u long").select(
        "i",
        "u",
        F.format_string(
            "%.2f",
            F.when(F.col("u") > 0, F.col("i") / F.col("u")).otherwise(F.lit(0.0)),
        ).alias("java"),
    )
    for r in df.collect():
        assert r["java"] == _pct_emulated(r["i"], r["u"]), (
            f"{r['i']}/{r['u']}: java={r['java']} "
            f"emulated={_pct_emulated(r['i'], r['u'])}"
        )


def test_jaccard_formatted_positions_are_the_global_sort(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    out = J.jaccard_formatted(docs).collect()
    by_pos = sorted(out, key=lambda r: r["out_pos"])
    assert [r["out_pos"] for r in by_pos] == list(range(1, len(out) + 1))
    keys = [(r["doc_a"], r["doc_b"]) for r in by_pos]
    assert keys == sorted(keys), "out_pos order != (doc_a, doc_b) order"
    for r in by_pos:
        assert r["line"].startswith(f"{r['doc_a']}, {r['doc_b']}\tSimilarity: ")


def test_jaccard_formatted_refuses_string_ids(spark):
    import pytest

    docs = spark.createDataFrame(
        [("DocumentA", "alpha beta"), ("DocumentB", "beta gamma")],
        "doc_id string, text string",
    )
    with pytest.raises(NotImplementedError, match="run_reference_pipeline"):
        J.jaccard_formatted(docs)


def test_containment_pruned_is_a_subset_with_identical_scores(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    exact = {
        (r["doc_a"], r["doc_b"]): r
        for r in D.containment_pairs(docs, min_containment=0.8).collect()
    }
    pruned = D.containment_pruned(docs, min_containment=0.8).collect()
    assert pruned, "LSH-pruned containment found nothing at sf0.001"
    for r in pruned:
        e = exact.get((r["doc_a"], r["doc_b"]))
        assert e is not None, f"pruned pair {r} not in the exact relation"
        for c in ("intersection", "size_a", "size_b", "cont_a", "cont_b"):
            assert r[c] == e[c], f"{c} mismatch on {r['doc_a']},{r['doc_b']}"


def test_packed_pair_dedup_survives_int_typed_ids(spark):
    """Regression: the packed-pair fast path shifts ids left by 32, and
    Java masks the shift amount mod the operand width — on a 32-bit INT
    id column the shift was a silent no-op that corrupted the packed
    pair. Ids are now cast to long before packing; int-typed ids must
    produce the same relation as the same data typed long."""
    from jaccard_mapreduce_spark.operators import similarity as S

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    as_int = emb.withColumn("vec_id", F.col("vec_id").cast("int"))
    want = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in S.ann_lsh_topk(emb, k=5).collect()
    }
    got = {
        (int(r["query_id"]), int(r["neighbor_id"]), r["rank"])
        for r in S.ann_lsh_topk(as_int, k=5).collect()
    }
    assert got == want

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    as_int_docs = docs.withColumn("doc_id", F.col("doc_id").cast("int"))
    want_p = {
        (r["doc_a"], r["doc_b"], round(r["similarity"], 12))
        for r in D.minhash_lsh_dedup(docs, threshold=0.7).collect()
    }
    got_p = {
        (int(r["doc_a"]), int(r["doc_b"]), round(r["similarity"], 12))
        for r in D.minhash_lsh_dedup(as_int_docs, threshold=0.7).collect()
    }
    assert got_p == want_p


def test_lsh_params_for_tracks_bucket_occupancy():
    from jaccard_mapreduce_spark.operators.similarity import (
        DEFAULT_PLANES,
        lsh_params_for,
    )

    # at or below one bucket's worth, the graded default holds
    assert lsh_params_for(10) == DEFAULT_PLANES
    assert lsh_params_for(500) == DEFAULT_PLANES  # 500/64 -> 3, floored
    # occupancy math: 2^p buckets ≈ n / target
    assert lsh_params_for(64 * 2**10) == 10
    assert lsh_params_for(10**9) == 24  # the 100 TB-ish point


def test_q22_grades_a_nonempty_relation(spark):
    out = entrymod.queries()["q22_idle_customers"](spark, SF_ORACLE).collect()
    assert len(out) > 0, "q22 output empty again — the grade verifies nothing"
    assert sum(r["n_customers"] for r in out) > 0
