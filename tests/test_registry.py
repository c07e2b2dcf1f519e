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


def test_window_is_the_declared_rotation():
    window = list(entrymod.queries())[:50]
    declared = getattr(
        entrymod, f"_R{entrymod._WINDOW_DESIGN_ROUND}_WINDOW"
    )
    assert window == declared
    assert len(set(declared)) == 50


def test_bench_rotation_covers_every_key_within_four_rounds():
    """Perf regressions in keys rotated out of the correctness window
    must not hide: bench.py runs its core list every round plus a
    deterministic cohort of the remaining oracle-backed keys, keyed by
    the window design round mod N_BENCH_COHORTS — the union of the
    cohorts over any N consecutive rounds is the full registry."""
    import re

    import bench

    src = open(bench.__file__).read()
    m = re.search(r"bench_queries = \[(.*?)\]", src, re.S)
    core = set(re.findall(r'"([a-z0-9_]+)"', m.group(1)))
    all_keys = set(entrymod.queries()) | set(entrymod.bench_only_queries())
    unknown = sorted(core - all_keys)
    assert not unknown, f"bench names unknown queries: {unknown}"
    # the core list must stay BOUNDED (round-8 verdict: its monotonic
    # growth pushed total wall-clock past the driver's kill budget and
    # the artifact died) — slowest-15 + the round's new/changed keys
    # plus a little headroom, never the old 100+ accretion
    assert len(core) <= 40, (
        f"bench core list has grown to {len(core)} keys — rotate, "
        "don't append (round-8 verdict item 1)"
    )
    covered = set(core)
    for r in range(bench.N_BENCH_COHORTS):
        covered |= set(bench.rotating_cohort(all_keys, core, set(), r))
    gaps = sorted(all_keys - covered)
    assert not gaps, (
        f"keys outside both the bench core list and the rotation: {gaps}"
    )
    # the cohorts for consecutive rounds must be disjoint slices (a
    # stable partition), so each key's bench cadence is exactly one in
    # N_BENCH_COHORTS rounds
    slices = [
        set(bench.rotating_cohort(all_keys, core, set(), r))
        for r in range(bench.N_BENCH_COHORTS)
    ]
    for i in range(len(slices)):
        for j in range(i + 1, len(slices)):
            assert not (slices[i] & slices[j])


def _last_green_before(design_round: int) -> dict[str, int]:
    """Each key's most recent green driver grade among the committed
    CORRECTNESS_r*.json files BEFORE the design round — the evidence
    the window rotation was designed against."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    last: dict[str, int] = {}
    seen: list[int] = []
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        r = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        seen.append(r)
        if r >= design_round:
            continue
        with open(path) as fh:
            graded = json.load(fh)
        for key, v in graded.items():
            green = v.get("hash_match") or (
                v.get("rows_match") and not v.get("err")
            )
            if green:
                last[key] = max(last.get(key, 0), r)
    # one round of grace: the design round's own report may land before
    # the next rotation, but a report from a LATER round means the
    # rotation (and _WINDOW_DESIGN_ROUND) was never bumped — rotate.
    assert max(seen) <= design_round, (
        f"CORRECTNESS_r{max(seen):02d} postdates the window design round "
        f"{design_round}: rotate the window and bump _WINDOW_DESIGN_ROUND"
    )
    return last


def test_rotation_cannot_starve_a_stale_key():
    """The automated replacement for the old hand-curated cohort lists:
    staleness is computed from the committed CORRECTNESS reports, and
    the graded window must contain (a) every entry declared new/changed
    for the design round and (b) the stalest remaining keys — no key
    outside the window may be strictly staler than a key inside it, so
    rotation can never silently starve a key of its independent driver
    grade. Never-graded keys rank stalest of all, which also enforces
    the 'new entries sit in the first 50' invariant."""
    design = entrymod._WINDOW_DESIGN_ROUND
    last = _last_green_before(design)
    window = set(list(entrymod.queries())[:50])
    new_or_changed = set(entrymod._NEW_OR_CHANGED)

    missing = [k for k in new_or_changed if k not in window]
    assert not missing, f"new/changed entries outside the window: {missing}"

    # documented transitive-coverage exemptions: allowed to sit outside
    # the window while stale, but the list must stay small and every
    # entry must carry a justification — the guard's escape hatch, not
    # a bypass
    exempt = entrymod._TRANSITIVE_EXEMPT
    assert len(exempt) <= 5, "transitive-exempt list is growing unchecked"
    assert all(isinstance(v, str) and len(v) > 20 for v in exempt.values())

    ranked = {
        k: last.get(k, 0)
        for k in entrymod.queries()
        if k not in new_or_changed and k not in exempt
    }
    # default=0: a window filled entirely by new/changed + exempt
    # entries leaves nothing ranked inside — that trivially passes
    # (no in-window key to be staler than) rather than erroring
    freshest_inside = max(
        (ranked[k] for k in ranked if k in window), default=0
    )
    starved = sorted(
        k
        for k, r in ranked.items()
        if k not in window and r < freshest_inside
    )
    assert not starved, (
        f"keys staler (last green round < {freshest_inside}) than an "
        f"in-window key were left outside the graded window: {starved}"
    )
