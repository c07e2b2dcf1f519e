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


# ---------------------------------------------------------------------------
# Decorrelation rewrites vs brute-force Python oracles (round 4): the
# contract oracles prove equivalence on the fixed test tables; these
# prove it across randomized relation shapes (empty orders, single-
# supplier orders, all-returned orders, boundary quantities).
# ---------------------------------------------------------------------------


def _brute_q21(lineitems, f_orders):
    """Literal double-EXISTS semantics, per supplier."""
    from collections import Counter, defaultdict

    by_order = defaultdict(list)
    for ok, sk, fl in lineitems:
        by_order[ok].append((sk, fl))
    waiting: Counter = Counter()
    for ok, sk, fl in lineitems:
        if fl != "R" or ok not in f_orders:
            continue
        others = [(s, f) for s, f in by_order[ok] if s != sk]
        if not others:
            continue  # NOT EXISTS(other supplier) -> fails EXISTS
        if any(f == "R" for _s, f in others):
            continue  # another supplier also returned
        waiting[sk] += 1
    return dict(waiting)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_q21_decorrelation_matches_bruteforce(spark, data):
    from jaccard_mapreduce_spark.operators.relational import (
        q21_waiting_suppliers,
    )

    li_row = st.tuples(
        st.integers(min_value=0, max_value=5),      # orderkey
        st.integers(min_value=0, max_value=4),      # suppkey
        st.sampled_from(["R", "N", "A"]),           # returnflag
    )
    lineitems = data.draw(st.lists(li_row, min_size=0, max_size=30))
    statuses = data.draw(
        st.lists(st.sampled_from(["F", "O", "P"]), min_size=6, max_size=6)
    )
    orders = [(ok, statuses[ok]) for ok in range(6)]
    f_orders = {ok for ok, s in orders if s == "F"}
    expected = _brute_q21(lineitems, f_orders)

    li_df = (
        spark.createDataFrame(
            lineitems, "l_orderkey long, l_suppkey long, l_returnflag string"
        )
        if lineitems
        else spark.createDataFrame(
            [], "l_orderkey long, l_suppkey long, l_returnflag string"
        )
    )
    ord_df = spark.createDataFrame(
        orders, "o_orderkey long, o_orderstatus string"
    )
    supp_df = spark.createDataFrame(
        [(k, f"S{k}", 0) for k in range(5)],
        "s_suppkey long, s_name string, s_nationkey long",
    )
    nat_df = spark.createDataFrame(
        [(0, "N0")], "n_nationkey long, n_name string"
    )
    got = {
        r["s_suppkey"]: r["numwait"]
        for r in q21_waiting_suppliers(
            supp_df, nat_df, ord_df, li_df, k=1000
        ).collect()
    }
    assert got == expected


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_q17_decorrelation_matches_bruteforce(spark, data):
    from collections import defaultdict

    from jaccard_mapreduce_spark.operators.relational import (
        q17_small_quantity_revenue,
    )

    li_row = st.tuples(
        st.integers(min_value=0, max_value=3),       # partkey
        st.integers(min_value=1, max_value=50),      # quantity (integral)
        st.integers(min_value=1, max_value=1000),    # extendedprice
    )
    lineitems = data.draw(st.lists(li_row, min_size=1, max_size=25))
    parts = [(pk, f"Brand#{pk % 2}") for pk in range(4)]

    qty_by_part = defaultdict(list)
    for pk, q, _p in lineitems:
        qty_by_part[pk].append(q)
    expected = defaultdict(lambda: [0.0, 0])
    for pk, q, p in lineitems:
        avg = sum(qty_by_part[pk]) / len(qty_by_part[pk])
        if q < 0.2 * avg:
            brand = f"Brand#{pk % 2}"
            expected[brand][0] += p
            expected[brand][1] += 1
    expected = {
        b: (s / 7.0, n) for b, (s, n) in expected.items() if n > 0
    }

    li_df = spark.createDataFrame(
        [(pk, float(q), float(p), 0.0) for pk, q, p in lineitems],
        "l_partkey long, l_quantity double, l_extendedprice double, l_discount double",
    )
    part_df = spark.createDataFrame(
        parts, "p_partkey long, p_brand string"
    )
    got = {
        r["p_brand"]: (r["avg_yearly"], r["n_small_items"])
        for r in q17_small_quantity_revenue(li_df, part_df).collect()
    }
    assert set(got) == set(expected)
    for b, (ay, n) in expected.items():
        assert got[b][1] == n
        assert got[b][0] == pytest.approx(ay, rel=1e-9)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vecs=st.lists(
        st.lists(
            st.floats(-4, 4, allow_nan=False, width=32), min_size=4, max_size=4
        ),
        min_size=3,
        max_size=12,
    ),
    k=st.integers(2, 3),
)
def test_kmeans_int8_matches_python_lloyd(spark, vecs, k):
    """kmeans_int8 against a from-scratch Python integer-Lloyd: identical
    quantization, seeding, argmin tie-break and floored-mean update."""
    import math

    from jaccard_mapreduce_spark.operators.similarity import kmeans_int8

    def quant(v):
        mn, mx = min(v), max(v)
        if mx - mn <= 0:
            return [-128] * len(v)
        return [int(math.floor((x - mn) / (mx - mn) * 255.0 + 0.5)) - 128 for x in v]

    q = {i: quant([float(x) for x in v]) for i, v in enumerate(vecs)}
    cents = {c: list(q[i]) for c, i in enumerate(sorted(q)[:k])}

    def assign(cents):
        out = {}
        for i, v in q.items():
            best = min(
                cents,
                key=lambda c: (sum((a - b) ** 2 for a, b in zip(v, cents[c])), c),
            )
            out[i] = (best, sum((a - b) ** 2 for a, b in zip(v, cents[best])))
        return out

    for _ in range(2):
        a = assign(cents)
        groups: dict[int, list] = {}
        for i, (c, _d) in a.items():
            groups.setdefault(c, []).append(q[i])
        cents = {
            c: [
                int(math.floor(sum(col) / len(vs)))
                for col in zip(*vs)
            ]
            for c, vs in groups.items()
        }
    expected = assign(cents)

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        ["vec_id", "embedding"],
    ).selectExpr("vec_id", "transform(embedding, x -> CAST(x AS FLOAT)) AS embedding")
    got = {
        r["vec_id"]: (r["cluster"], r["dist"])
        for r in kmeans_int8(df, k=k, iters=2, dim=4).collect()
    }
    assert got == expected


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(lambda e: e[0] != e[1]),
        min_size=0,
        max_size=15,
    )
)
def test_pagerank_update_matches_python_reference(spark, edges):
    """The integer damped update against a from-scratch Python fold over
    the same symmetrized edge set, fed directly into the factored
    iteration core (pair sources - LSH/SimHash/containment - are
    covered by their own oracles)."""
    from jaccard_mapreduce_spark.operators.dedup import pagerank_iterate

    n = 10
    canon = {tuple(sorted(e)) for e in edges}
    adj: dict[int, set[int]] = {i: set() for i in range(n)}
    for a, b in canon:
        adj[a].add(b)
        adj[b].add(a)
    scale = 1_000_000
    rank = {i: scale for i in range(n)}
    for _ in range(2):
        contrib = {i: 0 for i in range(n)}
        for u in range(n):
            if adj[u]:
                share = rank[u] // len(adj[u])
                for v in adj[u]:
                    contrib[v] += share
        rank = {i: (15 * scale + 85 * contrib[i]) // 100 for i in range(n)}

    nodes = spark.createDataFrame([(i,) for i in range(n)], ["doc_id"])
    pairs = spark.createDataFrame(
        sorted(canon) or [], "doc_a long, doc_b long"
    )
    got = {
        r["doc_id"]: r["rank"]
        for r in pagerank_iterate(nodes, pairs, iters=2).collect()
    }
    assert got == rank


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(_doc_text, min_size=2, max_size=8))
def test_containment_matches_python_sets(spark, texts):
    from jaccard_mapreduce_spark.operators.dedup import containment_pairs

    docs = [(i, t) for i, t in enumerate(texts)]
    sets = {i: _py_tokenize(t) for i, t in docs}
    expected = {}
    for a in sets:
        for b in sets:
            if a < b and sets[a] and sets[b]:
                inter = len(sets[a] & sets[b])
                ca, cb = inter / len(sets[a]), inter / len(sets[b])
                if inter >= 1 and (ca >= 0.8 or cb >= 0.8):
                    expected[(a, b)] = (inter, ca, cb)
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        (r["doc_a"], r["doc_b"]): (r["intersection"], r["cont_a"], r["cont_b"])
        for r in containment_pairs(df, min_containment=0.8).collect()
    }
    assert set(got) == set(expected)
    for k, (inter, ca, cb) in expected.items():
        gi, gca, gcb = got[k]
        assert gi == inter
        assert gca == pytest.approx(ca, abs=1e-12)
        assert gcb == pytest.approx(cb, abs=1e-12)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(_doc_text, min_size=1, max_size=8), n=st.integers(2, 3))
def test_boilerplate_spans_match_python_sets(spark, texts, n):
    from jaccard_mapreduce_spark.operators.dedup import boilerplate_span_stats

    def py_shingles(text: str) -> set[str]:
        cleaned = _TOKEN_RE.sub(" ", text.lower())
        toks = [t for t in cleaned.split() if t]
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    docs = [(i, t) for i, t in enumerate(texts)]
    grams = {i: py_shingles(t) for i, t in docs}
    df_count: dict[str, int] = {}
    for g in grams.values():
        for s in g:
            df_count[s] = df_count.get(s, 0) + 1
    expected = {
        i: (len(g), sum(1 for s in g if df_count[s] > 1))
        for i, g in grams.items()
    }
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_grams"], r["n_shared_grams"])
        for r in boilerplate_span_stats(df, n=n).collect()
    }
    assert got == expected


@given(
    u=st.integers(min_value=1, max_value=1_000_000),
    data=st.data(),
)
@settings(max_examples=300, deadline=None)
def test_halfup_pct_formula_matches_exact_decimal_rounding(u, data):
    """The jaccard_formatted oracle's integer formula
    ``pct = (200*I + U) div (2*U)`` must equal HALF_UP rounding of the
    exact rational ``100*I/U`` to 2 decimals for every (I, U) — the
    arithmetic claim behind grading Java's %.2f with integers
    (operators/jaccard.py::jaccard_formatted docstring). Checked
    against Python's exact Decimal arithmetic at 50-digit precision
    (a tie within 1e-48 of .xx5 is impossible for U <= 1e6, so the
    high-precision quantize is exact)."""
    import decimal

    i = data.draw(st.integers(min_value=0, max_value=u))
    pct = (200 * i + u) // (2 * u)
    ctx = decimal.Context(prec=50, rounding=decimal.ROUND_HALF_UP)
    exact = ctx.divide(decimal.Decimal(100 * i), decimal.Decimal(u))
    want = int(
        exact.quantize(
            decimal.Decimal(1), rounding=decimal.ROUND_HALF_UP, context=ctx
        )
    )
    assert pct == want, f"I={i} U={u}: formula {pct} != decimal {want}"


def _py_token_list(text: str) -> list[str]:
    """Order-preserving tokenizer twin (duplicates kept)."""
    return [t for t in _TOKEN_RE.sub(" ", text.lower()).split() if t]


def _py_phrase_occurrences(
    doc_tokens: list[str], phrase_tokens: list[str]
) -> int:
    """Naive verbatim-occurrence count — the from-scratch reference
    the positional start-vote trick must agree with."""
    n = len(phrase_tokens)
    if n == 0 or len(doc_tokens) < n:
        return 0
    return sum(
        1
        for s in range(len(doc_tokens) - n + 1)
        if doc_tokens[s : s + n] == phrase_tokens
    )


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(_doc_text, min_size=1, max_size=6),
    phrases=st.lists(_doc_text, min_size=1, max_size=3),
)
def test_phrase_search_matches_naive_python(spark, texts, phrases):
    """The positional start-vote construction (operators/retrieval.py::
    phrase_search) against a naive O(len·n) Python scan over random
    corpora — duplicate tokens, empty docs, phrases longer than docs,
    single-token phrases, everything the strategy generates. Scores
    (occurrence counts) must match exactly; k is set above any possible
    result size so top-k truncation is out of the comparison."""
    from jaccard_mapreduce_spark.operators.retrieval import phrase_search

    docs = [(i, t) for i, t in enumerate(texts)]
    # phrase ids offset past doc ids (the self-exclusion is id-based)
    pdocs = [(1000 + i, t) for i, t in enumerate(phrases)]
    tok = {i: _py_token_list(t) for i, t in docs}
    ptok = {i: _py_token_list(t) for i, t in pdocs}
    expected = {}
    for pid, pt in ptok.items():
        if not pt:
            continue  # empty phrase: no terms, no matches
        for did, dt in tok.items():
            c = _py_phrase_occurrences(dt, pt)
            if c > 0:
                expected[(pid, did)] = c
    df = spark.createDataFrame(docs, "doc_id long, text string")
    pf = spark.createDataFrame(pdocs, "phrase_id long, phrase string")
    got = {
        (r["query_id"], r["neighbor_id"]): r["score"]
        for r in phrase_search(df, pf, k=10_000).collect()
    }
    assert got == expected
