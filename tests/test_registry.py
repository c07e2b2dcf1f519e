"""Contract-registry shape guards.

The grading driver consumes only the FIRST 50 ``queries()`` entries and
counts any entry without an ``oracle_sql()`` key as a FAILED query, so
the registry's shape is load-bearing: these tests fail fast on an
accidental reorder, a query added without its oracle, or an oracle
orphaned by a rename — mistakes that would otherwise only surface in
the next round's CORRECTNESS report.
"""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_every_query_has_an_oracle():
    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    missing = [k for k in qs if k not in osql]
    assert not missing, f"queries without oracle_sql: {missing}"


def test_no_orphan_oracles():
    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    orphans = [k for k in osql if k not in qs]
    assert not orphans, f"oracle_sql without queries entry: {orphans}"


def test_window_holds_at_least_fifty_entries():
    assert len(entrymod.queries()) >= 50


def test_bench_only_entries_stay_out_of_the_contract():
    # rows-only operators must not leak into queries(): the driver
    # would grade them as failures (err=no_oracle)
    qs = entrymod.queries()
    for k in entrymod.bench_only_queries():
        assert k not in qs, f"bench-only entry {k} leaked into queries()"


def test_round6_rotation_targets_are_in_the_graded_window():
    """The round-6 window intent: the window IS _R6_WINDOW, in order —
    new/changed round-6 entries first, round-5 single-grades for a
    second green, then the 30 entries whose driver grade was last
    refreshed in round 1."""
    window = list(entrymod.queries())[:50]
    assert window == entrymod._R6_WINDOW
    must_grade = [
        # new in round 6
        "ivf_index_upsert", "corpus_text_roundtrip",
        "containment_recall_audit", "q4_order_priority",
        "lsh_index_search", "lsh_index_serve",
        "mixture_plan", "mixture_resample", "packing_efficiency",
        # changed in round 6 (IVF retune, kernel filter, repartitions)
        "ivf_index_search", "ann_ivf_topk", "ivf_recall_audit",
        "dedup_minhash_lsh", "containment_pruned", "kmeans_int8",
        "semantic_dedup", "ann_lsh_topk",
        # round-5 first-grades staying for their second green
        "jaccard_formatted", "kmeans_label_purity", "source_token_drift",
        "q2_min_cost_supplier", "q11_partsupp", "q16_partsupp",
        "q9_partsupp", "q20_partsupp",
    ]
    out = [k for k in must_grade if k not in window]
    assert not out, f"round-6 must-grade entries outside the window: {out}"


def test_round1_stale_cohort_pulled_forward():
    """Cross-referencing CORRECTNESS_r01..r05: 31 entries were last
    driver-graded in round 1; all but the bench-only
    ann_cosine_topk_fast must sit in the round-6 window. Exceptions
    (each rotates out ONLY because an in-window entry grades its chain
    transitively): doc_split, doc_sizes and pair_intersections make
    room for q4_order_priority, lsh_index_search and lsh_index_serve
    (their O3/O7/O8-O13 chains ride through jaccard_formatted);
    minhash_signatures and quality_filter make room for mixture_plan
    and mixture_resample (the former is the first stage of the
    in-window dedup_minhash_lsh chain, the latter is the in-window
    text_stats plus one boolean flag column); shard_assign makes room
    for packing_efficiency, whose base relation IS shard_assign's hash
    plus the bpe-ish token count."""
    window = set(list(entrymod.queries())[:50])
    stale = [
        "customer_order_windows", "customers_semi_anti", "dedup_embedding",
        "dedup_exact", "fingerprints", "lang_id",
        "lineitem_unpivot", "min_cost_supplier",
        "orders_exists_returned", "orders_grouping_sets", "orders_pivot",
        "orders_rollup", "orders_status_cube",
        "part_brand_stats", "q1_pricing_summary", "q3_top_orders",
        "q5_region_revenue", "q6_revenue",
        "salted_customer_revenue", "stratified_sample",
        "text_stats", "tfidf_top_terms", "token_counts", "top_suppliers",
    ]
    out = [k for k in stale if k not in window]
    assert not out, f"round-1-stale entries outside the window: {out}"
