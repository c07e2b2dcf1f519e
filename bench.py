"""Benchmark harness — prints ONE JSON line for the driver.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the reference's
own large dataset for direct BASELINE.md comparison (the reference's
local-mode 3-job pipeline: 10.09 s on datasets/large.txt; BASELINE.md
target for us: <= ~20 s — we aim well under).

Each query is forced through the `noop` sink: full computation, zero
result serialization, so the number measures the plan, not the collect.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from jaccard_mapreduce_spark.session import get_spark  # noqa: E402


def _force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def _load1() -> float:
    try:
        return round(os.getloadavg()[0], 2)
    except OSError:  # pragma: no cover - platform without getloadavg
        return -1.0


def _wait_for_quiet_host() -> tuple[float, bool]:
    """Pre-flight loadavg gate (round-7 verdict: the r7 bench ran at
    loadavg 7.7→9.2 and the +18% across untouched plans was pure host
    noise). Wait — up to SPARK_GRAFT_BENCH_LOAD_WAIT seconds, default
    300 — for the 1-minute loadavg to drop below
    SPARK_GRAFT_BENCH_MAX_LOAD (default 3.0) before measuring; if the
    host never quiets, proceed anyway and flag it in bench_detail so
    the medians are read as low-confidence rather than silently
    trusted. Returns (seconds waited, gate satisfied)."""
    max_load = float(os.environ.get("SPARK_GRAFT_BENCH_MAX_LOAD", "3.0"))
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_LOAD_WAIT", "300"))
    waited = 0.0
    while _load1() > max_load and waited < budget:
        time.sleep(15)
        waited += 15
    return round(waited, 1), _load1() <= max_load


# Every oracle-backed key not in the core list below (nor pre-built as
# an index demo) is benched on a deterministic 4-round rotation keyed
# by the window design round — so NO registry key goes more than
# N_BENCH_COHORTS rounds without a recorded sf0.1 timing, and a perf
# regression in a key rotated out of the correctness window cannot
# hide indefinitely. tests/test_registry.py asserts the rotation
# partitions the full registry.
N_BENCH_COHORTS = 4


def rotating_cohort(
    all_keys, core, prebuilt, round_no: int
) -> list[str]:
    rest = sorted(k for k in all_keys if k not in core and k not in prebuilt)
    return [
        k
        for i, k in enumerate(rest)
        if i % N_BENCH_COHORTS == round_no % N_BENCH_COHORTS
    ]


def main() -> None:
    load_waited_s, load_gate_ok = _wait_for_quiet_host()
    loadavg = [_load1()]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bench")

    import __spark_entry__ as entry

    from jaccard_mapreduce_spark.operators.jaccard import run_reference_pipeline

    qs = {**entry.queries(), **entry.bench_only_queries()}

    # Warm up JVM codegen + Python UDF workers once; the reference's
    # BASELINE numbers are per-pipeline compute, and a long-lived engine
    # amortizes startup — cold-start cost is reported separately below.
    t0 = time.perf_counter()
    _force(
        run_reference_pipeline(spark, "/root/reference/datasets/small.txt")
    )
    _force(qs["media_meta"](spark, "/root/testdata/sf0.001"))
    warmup_s = round(time.perf_counter() - t0, 3)

    # The persisted-index queries are BIMODAL by design: the session's
    # first call pays codebook training + the partitioned write, every
    # later call is search-only (the amortization the lifecycle exists
    # for). Averaging the two modes would measure neither, so the build
    # happens here, ONCE, and is reported separately — the per-query
    # medians below then measure the amortized serving cost, which is
    # the number a build-once/search-many index should be judged on.
    t0 = time.perf_counter()
    _force(qs["ivf_index_search"](spark, sf_dir))
    _force(qs["ivf_index_upsert"](spark, sf_dir))
    _force(qs["lsh_index_search"](spark, sf_dir))
    _force(qs["lsh_index_upsert"](spark, sf_dir))
    _force(qs["lsh_index_compact"](spark, sf_dir))
    _force(qs["dedup_incremental"](spark, sf_dir))
    _force(qs["minhash_index_upsert"](spark, sf_dir))
    # round-8 index faces: sq8 shares ivf_index_search's index (gate
    # hit — free); reband/stats build their own stores once here
    _force(qs["ivf_index_sq8"](spark, sf_dir))
    _force(qs["minhash_index_reband"](spark, sf_dir))
    _force(qs["minhash_index_stats"](spark, sf_dir))
    index_build_s = round(time.perf_counter() - t0, 3)

    bench_queries = [
        "jaccard_pairs",
        "jaccard_topk",
        "jaccard_threshold",
        "dedup_exact",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "text_stats",
        "lang_id",
        "fingerprints",
        "ann_cosine_topk_fast",
        "events_approx_stats",
        "q1_pricing_summary",
        "q3_top_orders",
        "q5_region_revenue",
        "q6_revenue",
        "min_cost_supplier",
        "tfidf_top_terms",
        "customer_order_windows",
        "events_sessionize",
        "events_daily",
        "asof_clicks_views",
        "events_interval_join",
        "user_funnel",
        "orders_pivot",
        "media_meta",
        # round-2 additions
        "contamination_check",
        "top_ngrams",
        "global_shuffle",
        "dedup_representatives",
        "prepare_corpus",
        # round-3 additions
        "ann_fast_ranks",
        "bucketed_customer_revenue",
        # round-4 additions
        "q17_small_quantity_revenue",
        "q20_dominant_suppliers",
        "q21_waiting_suppliers",
        "q13_customer_distribution",
        "q15_top_supplier",
        "q16_part_supplier_variety",
        "q8_market_share",
        "partitioned_events_summary",
        "bloom_pruned_revenue",
        "quality_curriculum",
        "minhash_error_audit",
        "kmeans_int8",
        "semantic_dedup",
        "formats_roundtrip",
        "pagerank_centrality",
        "containment_pairs",
        "boilerplate_span_stats",
        "stream_upsert_snapshot",
        "source_overlap_matrix",
        "gopher_quality_flags",
        "cohort_retention",
        "unigram_surprise",
        "ann_recall_audit",
        "customer_order_gaps",
        "dedup_cluster_sizes",
        "prepare_corpus_rules",
        "ivf_recall_audit",
        # round-6 additions
        "ivf_index_upsert",
        "corpus_text_roundtrip",
        "containment_recall_audit",
        "q4_order_priority",
        "lsh_index_search",
        "lsh_index_serve",
        "mixture_plan",
        "mixture_resample",
        "packing_efficiency",
        # round-7 additions
        "ivf_params_derived",
        "lsh_fast_ranks",
        "ann_scale_probe",
        "boilerplate_scrub",
        "chunk_documents",
        "ann_sq8_topk",
        "lsh_index_upsert",
        "sq8_rank_audit",
        "zordered_events_summary",
        "key_skew_stats",
        "train_val_split",
        "split_leakage_audit",
        "clustered_split",
        "clustered_split_leakage",
        "lsh_index_compact",
        "dedup_incremental",
        "minhash_index_upsert",
        "effective_token_stats",
        "bigram_surprise",
        # round-5 additions
        "jaccard_formatted",
        "containment_pruned",
        "vocabulary",
        "ann_lsh_topk",
        "ann_ivf_topk",
        "q2_min_cost_supplier",
        "q9_partsupp",
        "q11_partsupp",
        "q16_partsupp",
        "q20_partsupp",
        "q22_idle_customers",
        "source_token_drift",
        "ivf_index_search",
        "kmeans_label_purity",
        # round-8 additions
        "ivf_index_sq8",
        "minhash_index_reband",
        "minhash_index_stats",
        "lsh_dist_ranks",
        "ivf_dist_ranks",
    ]
    prebuilt = {
        "ivf_index_upsert",
        "lsh_index_search",
        "lsh_index_serve",
        "lsh_index_upsert",
        "lsh_index_compact",
        "dedup_incremental",
        "minhash_index_upsert",
    }
    cohort = rotating_cohort(
        qs, set(bench_queries), prebuilt, entry._WINDOW_DESIGN_ROUND
    )
    bench_queries = bench_queries + cohort

    # local[32] wall-clock swings 2-3x with ambient load: run each query
    # REPS times and report the MEDIAN so round-over-round deltas are
    # attributable to plan changes, not scheduler noise. min/max recorded
    # per query for the spread.
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    # spread bound = ±40% of the median (round-5 verdict ask): a query
    # whose min/max straddle more than that gets up to EXTRA_REPS
    # additional samples (ambient-load spikes hit one rep, not all);
    # if the spread is STILL wider, the query is flagged noisy in
    # bench_detail.json so its median is read as low-confidence rather
    # than silently trusted.
    extra_reps = max(0, int(os.environ.get("SPARK_GRAFT_BENCH_EXTRA_REPS", "2")))

    def timed(fn) -> tuple[float, float, float, bool]:
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            samples.append(time.perf_counter() - t0)
        samples.sort()
        grants = extra_reps
        while (
            samples[-1] - samples[0] > 0.8 * samples[len(samples) // 2]
            and grants > 0
        ):
            t0 = time.perf_counter()
            fn()
            samples.append(time.perf_counter() - t0)
            samples.sort()
            grants -= 1
        med = samples[len(samples) // 2]
        noisy = samples[-1] - samples[0] > 0.8 * med
        return (
            round(med, 3),
            round(samples[0], 3),
            round(samples[-1], 3),
            noisy,
        )

    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    noisy_queries: list[str] = []
    errors: dict[str, str] = {}

    # Reference-parity pipeline on the reference's own largest dataset —
    # the direct apples-to-apples number vs BASELINE.md (1DN local mode).
    med, lo, hi, noisy = timed(
        lambda: _force(
            run_reference_pipeline(spark, "/root/reference/datasets/large.txt")
        )
    )
    timings["jaccard_ref_large"] = med
    spread["jaccard_ref_large"] = [lo, hi]
    if noisy:
        noisy_queries.append("jaccard_ref_large")

    for name in bench_queries:
        # one query erroring must not lose the whole artifact: record
        # the error and keep timing the rest (observed: a 184 s driver
        # GC stall tripped the local-mode heartbeat timeout mid-run and
        # every later query died — the session factory now raises the
        # timeout, and this guard makes any residual failure partial
        # instead of total)
        try:
            med, lo, hi, noisy = timed(lambda: _force(qs[name](spark, sf_dir)))
        except Exception as exc:  # noqa: BLE001 - survey, not control flow
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            spark.catalog.clearCache()
            continue
        timings[name] = med
        spread[name] = [lo, hi]
        if noisy:
            noisy_queries.append(name)
        # Drop this query's pinned relations before the next one: the
        # pin() persists are session-lived, and across 90+ queries the
        # accumulated storage triggers eviction storms that inflate
        # LATE queries' medians 3x (observed: ann_lsh_topk min 7.4 s /
        # median 23.5 s in the same run). Within a query's reps the
        # cache still works exactly as before (rep 1 builds, later
        # reps reuse); the persisted-index demos live on DISK behind
        # session markers and are unaffected.
        spark.catalog.clearCache()

    loadavg.append(_load1())
    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # Full detail (per-query min/max spread, reps, warmup) goes to a
    # sidecar file; stdout carries ONE COMPACT line — the driver records
    # only a bounded stdout tail, and rounds 1-3 proved the verbose line
    # overflows it ("parsed": null in BENCH_r01-r03). Medians at 2dp keep
    # the line well under ~2 KB at the current query count.
    detail = {
        "queries_median": timings,
        "spread_min_max": spread,
        # medians whose spread exceeded ±40% even after extra reps —
        # read these as low-confidence (host noise), not plan deltas
        "noisy_queries": sorted(noisy_queries),
        # queries that errored this run (absent from queries_median);
        # empty on a clean run
        "errors": errors,
        "reps": reps,
        "extra_reps_budget": extra_reps,
        # one-time cost of building ALL FOUR persisted indexes (IVF
        # search/upsert + LSH search/upsert demos) — paid before the
        # reps so their medians measure amortized search, not a
        # build/search mixture
        "index_build_seconds": index_build_s,
        "sf": sf_val,
        "warmup_seconds": warmup_s,
        # ambient host load at start/end: local[32] wall-clock inflates
        # 2-3x under phantom host contention (observed round 4: same
        # commit, same data, 7->21 s on one query as load_avg climbed) —
        # record it so cross-round deltas can be attributed
        "loadavg_1m_start_end": loadavg,
        # pre-flight quiet-host gate: seconds spent waiting for the
        # 1-min loadavg to drop under the threshold, and whether it
        # did — a False here means the whole run is load-confounded
        "loadavg_gate": {
            "waited_seconds": load_waited_s,
            "quiet": load_gate_ok,
        },
        # this round's rotating-coverage cohort (every oracle-backed
        # key outside the core list is benched at least once every
        # N_BENCH_COHORTS rounds)
        "rotating_cohort": {
            "round": entry._WINDOW_DESIGN_ROUND,
            "keys": cohort,
        },
        "total_seconds": total,
    }
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_detail.json"
    )
    with open(detail_path, "w") as fh:
        json.dump(detail, fh, indent=1, sort_keys=True)
    # The driver records only a bounded stdout tail (~2000 chars). At 80+
    # queries the full per-query map is ~2.1 KB and the HEAD of the line —
    # including the metric itself — gets truncated away (BENCH_r06:
    # "parsed": null). So stdout carries a headline subset only:
    # jaccard_ref_large (the BASELINE.md comparison) plus the slowest
    # queries, budgeted to stay well under 1.5 KB with growth headroom;
    # the complete map lives in bench_detail.json.
    headline = {"jaccard_ref_large": timings["jaccard_ref_large"]}
    for name, sec in sorted(timings.items(), key=lambda kv: -kv[1]):
        if len(headline) >= 8:
            break
        headline.setdefault(name, sec)
    line = json.dumps(
        {
            "metric": "bench_total_seconds",
            "value": total,
            "unit": "sec",
            "queries": {k: round(v, 2) for k, v in headline.items()},
            "n_queries": len(timings),
            "detail": "bench_detail.json",
            "sf": sf_val,
        },
        separators=(",", ":"),
    )
    assert len(line) <= 1500, f"bench stdout line too long: {len(line)}"
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
