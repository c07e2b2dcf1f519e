"""Property-based and adversarial-fixture tests (SURVEY.md §5.2,
FIXTURES.md §6): the engine against a from-scratch Python set-arithmetic
oracle on random corpora, plus the skew / identical / disjoint fixtures.
"""

from __future__ import annotations

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from jaccard_mapreduce_spark.operators.jaccard import jaccard_pairs

_TOKEN_RE = re.compile(r"[^a-z0-9\s]")


def _py_tokenize(text: str) -> set[str]:
    """Independent reimplementation of the reference tokenizer
    (DocumentSimilarityMapper.java:80-89)."""
    cleaned = _TOKEN_RE.sub(" ", text.lower())
    return {t for t in cleaned.split() if t}


def _py_oracle(docs: list[tuple[str, str]]) -> dict[tuple[str, str], float]:
    sets = {d: _py_tokenize(t) for d, t in docs}
    out = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            if inter >= 1:
                union = len(sets[a] | sets[b])
                out[(a, b)] = inter / union
    return out


_token = st.text(alphabet="abcxyz012 .,!", min_size=0, max_size=8)
_doc_text = st.lists(_token, min_size=0, max_size=12).map(" ".join)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(_doc_text, min_size=1, max_size=8))
def test_matches_python_oracle(spark, texts):
    docs = [(f"d{i:03d}", t) for i, t in enumerate(texts)]
    expected = _py_oracle(docs)
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        (r["doc_a"], r["doc_b"]): r["similarity"]
        for r in jaccard_pairs(df, strategy="join").collect()
    }
    assert set(got) == set(expected)
    for k, v in expected.items():
        assert got[k] == pytest.approx(v, abs=1e-12)
        assert 0.0 < got[k] <= 1.0


def test_skew_one_token_in_all_docs(spark):
    """FIXTURES.md skew_corpus: a universal token forces the worst-case
    C(n,2) blowup through one join key; output must still be exact."""
    n = 200
    rows = [(f"d{i:04d}", f"common unique{i}") for i in range(n)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = jaccard_pairs(df, strategy="join")
    rows_out = pairs.collect()
    assert len(rows_out) == n * (n - 1) // 2
    # every pair shares exactly {common}: J = 1/3 (sizes are 2 and 2)
    assert all(r["intersection"] == 1 and r["similarity"] == pytest.approx(1 / 3) for r in rows_out)


def test_identical_docs_score_one(spark):
    rows = [("a", "x y z"), ("b", "z y x x"), ("c", "x  y,z")]
    got = jaccard_pairs(spark.createDataFrame(rows, ["doc_id", "text"])).collect()
    assert len(got) == 3
    assert all(r["similarity"] == 1.0 for r in got)


def test_disjoint_docs_produce_no_rows(spark):
    rows = [(f"d{i}", f"tok{i}a tok{i}b") for i in range(10)]
    got = jaccard_pairs(spark.createDataFrame(rows, ["doc_id", "text"]))
    assert got.count() == 0


def _py_components(n_nodes: int, edges: list[tuple[int, int]]) -> dict[int, int]:
    """Independent union-find reference: node -> min reachable node."""
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {v: find(v) for v in range(n_nodes)}


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_dedup_clusters_matches_union_find_reference(spark, data):
    from jaccard_mapreduce_spark.operators.dedup import dedup_clusters

    n = data.draw(st.integers(min_value=1, max_value=24))
    edge = st.tuples(
        st.integers(min_value=0, max_value=n - 1),
        st.integers(min_value=0, max_value=n - 1),
    ).filter(lambda e: e[0] != e[1])
    raw = data.draw(st.lists(edge, min_size=0, max_size=40))
    # canonical orientation, as every pair producer emits
    pairs = sorted({(min(a, b), max(a, b)) for a, b in raw})
    expected = _py_components(n, pairs)
    docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pair_df = (
        spark.createDataFrame(pairs, "doc_a long, doc_b long")
        if pairs
        else spark.createDataFrame([], "doc_a long, doc_b long")
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup_clusters(docs, pair_df).collect()
    }
    assert got == expected
