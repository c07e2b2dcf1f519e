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


def test_round4_rotation_targets_are_in_the_graded_window():
    """The round-4 window intent: every entry that has never received a
    driver CORRECTNESS row sits inside the first 50."""
    window = list(entrymod.queries())[:50]
    never_graded = [
        "source_mixture", "events_approx_check", "q10_returned_revenue",
        "q12_priority_shipclass", "q22_idle_customers",
        "dedup_cross_corpus", "length_histogram",
        "q8_market_share", "q13_customer_distribution",
        "q15_top_supplier", "q16_part_supplier_variety",
        "q17_small_quantity_revenue", "q20_dominant_suppliers",
        "q21_waiting_suppliers", "partitioned_events_summary",
        "bloom_pruned_revenue", "quality_curriculum",
        "minhash_error_audit", "q9_product_profit",
        "q11_value_concentration", "kmeans_int8", "semantic_dedup",
        "formats_roundtrip", "pagerank_centrality",
        "containment_pairs", "boilerplate_span_stats",
        "stream_upsert_snapshot", "source_overlap_matrix",
        "gopher_quality_flags", "cohort_retention", "unigram_surprise",
        "ann_recall_audit", "customer_order_gaps", "dedup_cluster_sizes",
        "prepare_corpus_rules", "ivf_recall_audit",
    ]
    out = [k for k in never_graded if k not in window]
    assert not out, f"never-driver-graded entries outside the window: {out}"
