#!/usr/bin/env python
"""Timing comparison report — the engine-side analog of the reference's
``compare_timings.py`` (regex over ``time -p`` logs → markdown table;
compare_timings.py:7-29 in /root/reference). Ours reads ``BENCH_r*.json``
lines produced by bench.py and prints a markdown table against the
reference's committed local-mode baseline (BASELINE.md).

Usage: python scripts/compare_timings.py [BENCH_r1.json ...]
"""

from __future__ import annotations

import json
import sys

# BASELINE.md wall-clock (1DN local mode, the honest compute baseline)
REFERENCE_LOCAL_S = {
    "small (50x200)": 5.97,
    "medium (100x400)": 8.00,
    "large (150x800)": 10.09,
}


def main(paths: list[str]) -> None:
    print("| run | query | seconds | reference large (s) | speedup |")
    print("|---|---|---:|---:|---:|")
    ref_large = REFERENCE_LOCAL_S["large (150x800)"]
    for p in paths:
        with open(p) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                for q, s in sorted(rec.get("queries", {}).items()):
                    speed = f"{ref_large / s:.2f}x" if q == "jaccard_ref_large" else ""
                    ref = f"{ref_large:.2f}" if q == "jaccard_ref_large" else ""
                    print(f"| {p} | {q} | {s:.3f} | {ref} | {speed} |")
                print(
                    f"| {p} | **total** | {rec['value']:.3f} | | "
                    f"(sf={rec.get('sf')}) |"
                )


if __name__ == "__main__":
    main(sys.argv[1:] or ["BENCH_r1.json"])
