"""Behavioral tests for relational operators whose semantics deserve a
hand-built fixture on top of the oracle-parity coverage."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F


def test_cohort_retention_triangle(spark):
    from jaccard_mapreduce_spark.operators.relational import cohort_retention

    base = datetime.datetime(2024, 1, 1)
    wk = datetime.timedelta(days=7)
    rows = [
        # user 1: first seen week 0, returns weeks 1 and 2
        (1, base), (1, base + wk), (1, base + 2 * wk),
        # user 2: first seen week 0, never returns
        (2, base + datetime.timedelta(days=3)),
        # user 3: first seen week 1, returns week 2 (twice in one week —
        # must count once)
        (3, base + wk), (3, base + 2 * wk), (3, base + 2 * wk + datetime.timedelta(hours=1)),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts"])
    got = {
        (r["cohort_week"], r["week_offset"]): r["n_users"]
        for r in cohort_retention(ev).collect()
    }
    assert got == {
        (0, 0): 2,  # users 1 and 2
        (0, 1): 1,  # user 1
        (0, 2): 1,  # user 1
        (1, 0): 1,  # user 3
        (1, 1): 1,  # user 3 (deduped within the week)
    }
