"""Unit tests for the Jaccard operator family (SURVEY.md §5.2)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jaccard_mapreduce_spark.functions.text import tokenize_unique, word_ngrams
from jaccard_mapreduce_spark.operators.jaccard import (
    doc_sizes,
    doc_tokens,
    jaccard_pairs,
    jaccard_threshold,
    jaccard_topk,
    format_output,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        ("d1", "Apple banana CHERRY apple!"),
        ("d2", "banana cherry durian"),
        ("d3", "elderberry fig"),
        ("d4", ""),  # empty text -> no tokens, no pairs
        ("d5", "apple banana cherry"),  # superset-ish of d1's set
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_tokenize_normalization(spark):
    df = spark.createDataFrame(
        [("x", "Hello, WORLD!! 42 hello\tworld  mixed-case")], ["doc_id", "text"]
    )
    toks = df.select(tokenize_unique("text").alias("t")).first()["t"]
    # lowercase, punctuation -> space, \s+ split, dedup, keep digits
    assert toks == ["hello", "world", "42", "mixed", "case"]


def test_tokenize_edge_cases(spark):
    df = spark.createDataFrame(
        [("a", "..."), ("b", "   "), ("c", "a.b,c")], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: r["t"]
        for r in df.select("doc_id", tokenize_unique("text").alias("t")).collect()
    }
    assert got["a"] == []
    assert got["b"] == []
    assert got["c"] == ["a", "b", "c"]


def test_doc_sizes(spark, corpus):
    sizes = {r["doc_id"]: r["size"] for r in doc_sizes(doc_tokens(corpus)).collect()}
    # d1: apple banana cherry (dedup of second 'apple') = 3
    assert sizes == {"d1": 3, "d2": 3, "d3": 2, "d5": 3}
    assert "d4" not in sizes  # tokenless doc absent (reference semantics)


@pytest.mark.parametrize("strategy", ["join", "bitmask"])
def test_jaccard_pairs_values(spark, corpus, strategy):
    rows = {
        (r["doc_a"], r["doc_b"]): r
        for r in jaccard_pairs(corpus, strategy=strategy).collect()
    }
    # d1 ∩ d2 = {banana, cherry} -> 2/(3+3-2)
    assert rows[("d1", "d2")]["intersection"] == 2
    assert rows[("d1", "d2")]["similarity"] == pytest.approx(0.5)
    # identical token sets -> 1.0
    assert rows[("d1", "d5")]["similarity"] == 1.0
    # disjoint docs absent entirely (no zero-intersection rows)
    assert ("d1", "d3") not in rows
    assert ("d2", "d3") not in rows
    assert set(rows) == {("d1", "d2"), ("d1", "d5"), ("d2", "d5")}


def test_strategies_agree(spark, corpus):
    a = sorted(map(tuple, jaccard_pairs(corpus, strategy="join").collect()))
    b = sorted(map(tuple, jaccard_pairs(corpus, strategy="bitmask").collect()))
    assert a == b


def test_threshold_and_topk(spark, corpus):
    pairs = jaccard_pairs(corpus, strategy="join")
    thr = jaccard_threshold(pairs, 0.9).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in thr} == {("d1", "d5")}

    top1 = {
        r["doc_id"]: r["neighbor_id"]
        for r in jaccard_topk(pairs, 1).collect()
    }
    assert top1["d1"] == "d5"
    assert top1["d5"] == "d1"


def test_divide_guard_zero_union(spark):
    # impossible via the pipeline (intersection>=1 implies union>=1) but the
    # guard is reference semantics (Reducer:103-104) — exercise directly
    df = spark.createDataFrame(
        [("a", "b", 0, 0, 0)], ["doc_a", "doc_b", "intersection", "size_a", "size_b"]
    )
    union = F.col("size_a") + F.col("size_b") - F.col("intersection")
    out = df.withColumn(
        "similarity",
        F.when(union > 0, F.col("intersection") / union).otherwise(F.lit(0.0)),
    ).first()
    assert out["similarity"] == 0.0


def test_format_output_rounding_ties(spark):
    # Java String.format('%.2f') HALF_UP on shortest repr: 9/200 = 0.045 -> 0.05
    df = spark.createDataFrame(
        [("a", "b", 9, 104, 105)], ["doc_a", "doc_b", "intersection", "size_a", "size_b"]
    ).withColumn("similarity", F.col("intersection") / (F.col("size_a") + F.col("size_b") - F.col("intersection")))
    line = format_output(df).first()["line"]
    assert line == "a, b\tSimilarity: 0.05"


def test_string_pair_order(spark):
    # "Document10" < "Document2" in string order (reference Reducer:42)
    rows = [("Document2", "x y z"), ("Document10", "x y q")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    p = jaccard_pairs(df, strategy="join").first()
    assert (p["doc_a"], p["doc_b"]) == ("Document10", "Document2")


def test_word_ngrams(spark):
    df = spark.createDataFrame([("d", "a b c d")], ["doc_id", "text"])
    got = df.select(word_ngrams(tokenize_unique("text"), 3).alias("g")).first()["g"]
    assert got == ["a b c", "b c d"]
    short = spark.createDataFrame([("d", "a b")], ["doc_id", "text"])
    got2 = short.select(word_ngrams(tokenize_unique("text"), 3).alias("g")).first()["g"]
    assert got2 == []


def test_auto_strategy_large_vocab_matches_join(spark):
    """The HLL probe must short-circuit to the join path on a vocabulary
    far above the bitmask gate, with results identical to forced join."""
    # alphanumeric-only synthetic words survive tokenization intact:
    # 200*20 = 4000 distinct tokens, far above the 2048 bitmask gate
    rows = [
        (f"d{i}", " ".join(f"w{i}a{j}" for j in range(20)) + " shared")
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    auto = {
        (r["doc_a"], r["doc_b"]): r["similarity"]
        for r in jaccard_pairs(df, strategy="auto").collect()
    }
    join = {
        (r["doc_a"], r["doc_b"]): r["similarity"]
        for r in jaccard_pairs(df, strategy="join").collect()
    }
    assert auto == join
    assert len(auto) == 200 * 199 // 2  # 'shared' links every doc pair
