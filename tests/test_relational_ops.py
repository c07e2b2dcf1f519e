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


def test_customer_order_gaps_hand_computed(spark):
    import datetime

    from jaccard_mapreduce_spark.operators.relational import customer_order_gaps

    d = lambda s: datetime.datetime.fromisoformat(s)
    rows = [
        # customer 1: orders on day 0, 10, 40 -> gaps 10, 30
        (101, 1, d("2024-01-01")),
        (102, 1, d("2024-01-11")),
        (103, 1, d("2024-02-10")),
        # customer 2: single order -> no gaps
        (104, 2, d("2024-03-01")),
        # customer 3: same-day orders -> gap 0 (tie broken by order key)
        (105, 3, d("2024-04-01")),
        (106, 3, d("2024-04-01")),
    ]
    df = spark.createDataFrame(rows, ["o_orderkey", "o_custkey", "o_orderdate"])
    got = {r["o_custkey"]: r for r in customer_order_gaps(df).collect()}
    assert got[1]["n_orders"] == 3
    assert (got[1]["min_gap_days"], got[1]["max_gap_days"]) == (10, 30)
    assert got[1]["avg_gap_days"] == 20.0
    assert got[2]["n_orders"] == 1 and got[2]["avg_gap_days"] is None
    assert got[3]["min_gap_days"] == 0 and got[3]["max_gap_days"] == 0
