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


def test_round5_rotation_targets_are_in_the_graded_window():
    """The round-5 window intent: every entry that is NEW this round or
    whose implementation/oracle CHANGED this round sits inside the
    first 50 (the driver grades only those), alongside the once-graded
    round-4 additions that stay for a second grade."""
    window = list(entrymod.queries())[:50]
    must_grade = [
        # new in round 5
        "jaccard_formatted", "q2_min_cost_supplier", "containment_pruned",
        "source_token_drift", "ivf_index_search", "kmeans_label_purity",
        "q9_partsupp", "q11_partsupp", "q16_partsupp", "q20_partsupp",
        # changed in round 5 (re-derived defaults / rebuilt plans)
        "vocabulary", "ann_lsh_topk", "ann_ivf_topk",
        "ann_recall_audit", "ivf_recall_audit", "q22_idle_customers",
        "stream_upsert_snapshot", "dedup_minhash_lsh",
        "gopher_quality_flags", "prepare_corpus_rules",
    ]
    out = [k for k in must_grade if k not in window]
    assert not out, f"round-5 must-grade entries outside the window: {out}"
