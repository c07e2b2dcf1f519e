"""Relational/OLAP operator coverage over the TPC-H-ish test tables.

These demonstrate the engine's general query surface — multi-way joins
with broadcast dimensions, hash aggregation, windows, sessionization,
cube rollups, semi/anti joins — the operators any analytics pipeline
composes around the similarity/dedup core.

Oracle-parity rules baked in:
  * money math is DECIMAL end-to-end (exact, order-independent) and only
    cast to DOUBLE at the output — identical bit patterns in both engines
  * averages are exact-decimal sums divided as doubles (one rounding)
  * timestamps never leave as raw values: the events table is ns-precision
    parquet, which Spark truncates to µs — outputs use epoch seconds /
    date strings, and orderings use unix micros, identical in both engines
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_D = "decimal(18,2)"


def _one():
    # decimal literal 1.00 (F.lit(1.0) would be a double and poison the
    # exact-decimal arithmetic); built lazily — F.expr needs a live session
    return F.expr("CAST(1 AS DECIMAL(3,2))")


def q1_pricing_summary(lineitem: DataFrame, ship_cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1 shape: scan-filter-aggregate with exact decimal money math."""
    li = lineitem.where(F.col("l_shipdate") <= ship_cutoff)
    qty = F.col("l_quantity").cast(_D)
    price = F.col("l_extendedprice").cast(_D)
    disc = F.col("l_discount").cast(_D)
    tax = F.col("l_tax").cast(_D)
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).alias("_sq"),
            F.sum(price).alias("_sp"),
            F.sum(price * (_one() - disc)).alias("_sd"),
            F.sum(price * (_one() - disc) * (_one() + tax)).alias("_sc"),
            F.count("*").alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            F.col("_sq").cast("double").alias("sum_qty"),
            F.col("_sp").cast("double").alias("sum_base_price"),
            F.col("_sd").cast("double").alias("sum_disc_price"),
            F.col("_sc").cast("double").alias("sum_charge"),
            (F.col("_sq").cast("double") / F.col("count_order")).alias("avg_qty"),
            (F.col("_sp").cast("double") / F.col("count_order")).alias("avg_price"),
            "count_order",
        )
    )


def q3_top_orders(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    k: int = 10,
) -> DataFrame:
    """TPC-H Q3 shape: 3-way join (broadcast customer dim), revenue agg,
    deterministic top-k."""
    price = F.col("l_extendedprice").cast(_D)
    disc = F.col("l_discount").cast(_D)
    joined = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(customer.where(F.col("c_mktsegment") == segment)),
            F.col("o_custkey") == F.col("c_custkey"),
        )
    )
    return (
        joined.groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(price * (_one() - disc)).alias("_rev"))
        .select(
            "o_orderkey",
            F.col("o_orderdate").cast("date").cast("string").alias("order_date"),
            "o_orderpriority",
            F.col("_rev").cast("double").alias("revenue"),
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(k)
    )


def q5_region_revenue(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    region_name: str = "ASIA",
) -> DataFrame:
    """TPC-H Q5 shape: snowflake join chain with broadcast dims, revenue
    per nation."""
    price = F.col("l_extendedprice").cast(_D)
    disc = F.col("l_discount").cast(_D)
    dims = (
        customer.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region.where(F.col("r_name") == region_name)),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
    )
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(dims, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("n_name")
        .agg(
            F.sum(price * (_one() - disc)).alias("_rev"),
            F.count("*").alias("n_lineitems"),
        )
        .select(
            "n_name",
            F.col("_rev").cast("double").alias("revenue"),
            "n_lineitems",
        )
    )


def customer_order_windows(orders: DataFrame, k: int = 3) -> DataFrame:
    """Window functions: top-k orders per customer by totalprice +
    running cumulative spend (exact decimal)."""
    price = F.col("o_totalprice").cast(_D)
    w_rank = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    w_cum = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        orders.withColumn("rn", F.row_number().over(w_rank).cast("long"))
        .withColumn("cum_spend", F.sum(price).over(w_cum))
        .where(F.col("rn") <= k)
        .select(
            "o_custkey",
            "o_orderkey",
            F.col("o_totalprice").cast(_D).cast("double").alias("total_price"),
            "rn",
            F.col("cum_spend").cast("double").alias("cum_spend"),
        )
    )


def customers_with_without_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Semi/anti join coverage: per-nation counts of customers that do /
    don't have orders."""
    with_o = customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).groupBy("c_nationkey").agg(F.count("*").alias("n_with_orders"))
    without_o = customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).groupBy("c_nationkey").agg(F.count("*").alias("n_without_orders"))
    return (
        with_o.join(without_o, "c_nationkey", "full_outer")
        .select(
            "c_nationkey",
            F.coalesce("n_with_orders", F.lit(0)).alias("n_with_orders"),
            F.coalesce("n_without_orders", F.lit(0)).alias("n_without_orders"),
        )
    )


def orders_status_cube(orders: DataFrame) -> DataFrame:
    """CUBE rollup over (status, priority) with exact decimal sums."""
    price = F.col("o_totalprice").cast(_D)
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"), F.sum(price).alias("_tp"))
        .select(
            "o_orderstatus",
            "o_orderpriority",
            "n_orders",
            F.col("_tp").cast("double").alias("total_price"),
        )
    )


def events_daily(events: DataFrame) -> DataFrame:
    """Tumbling-day rollup of the event stream (batch form; streaming
    variant in streaming/)."""
    val = F.col("value").cast(_D)
    return (
        events.groupBy(
            F.date_trunc("day", "ts").cast("date").cast("string").alias("day"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(val).alias("_sv"),
        )
        .select(
            "day", "event_type", "n_events", "n_users",
            F.col("_sv").cast("double").alias("sum_value"),
        )
    )


def events_sessionize(events: DataFrame, gap_seconds: int = 21600) -> DataFrame:
    """Gap-based sessionization: a new session starts when a user is idle
    longer than ``gap_seconds``. Pure window composition (lag -> gap flag
    -> cumulative session index), ns-safe (µs-epoch ordering).
    """
    epoch_us = F.unix_micros(F.col("ts"))
    w_order = Window.partitionBy("user_id").orderBy("ep_us", "event_id")
    ev = events.select("user_id", "event_id", epoch_us.alias("ep_us"), "value")
    ev = ev.withColumn("prev_us", F.lag("ep_us").over(w_order))
    is_new = (
        F.col("prev_us").isNull()
        | ((F.col("ep_us") - F.col("prev_us")) > gap_seconds * 1_000_000)
    ).cast("long")
    ev = ev.withColumn(
        "session_idx",
        F.sum(is_new).over(
            w_order.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    val = F.col("value").cast(_D)
    return (
        ev.groupBy("user_id", "session_idx")
        .agg(
            F.count("*").alias("n_events"),
            # integer div: float division + cast would round vs truncate
            # differently across engines
            F.expr("min(ep_us) div 1000000").alias("session_start_s"),
            F.expr("max(ep_us) div 1000000").alias("session_end_s"),
            F.sum(val).alias("_sv"),
        )
        .select(
            "user_id", "session_idx", "n_events",
            "session_start_s", "session_end_s",
            F.col("_sv").cast("double").alias("sum_value"),
        )
    )


def events_json_props(events: DataFrame) -> DataFrame:
    """JSON extraction from the string props column."""
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("prop_k"),
    )


def part_brand_stats(part: DataFrame) -> DataFrame:
    """Scalar-agg coverage: per-brand stats with exact decimal avg."""
    price = F.col("p_retailprice").cast(_D)
    return (
        part.groupBy("p_brand")
        .agg(
            F.count("*").alias("n_parts"),
            F.sum(price).alias("_sp"),
            F.min("p_size").cast("long").alias("min_size"),
            F.max("p_size").cast("long").alias("max_size"),
        )
        .select(
            "p_brand",
            "n_parts",
            (F.col("_sp").cast("double") / F.col("n_parts")).alias("avg_price"),
            "min_size",
            "max_size",
        )
    )


def asof_join_events(events: DataFrame, left_type: str = "click", right_type: str = "view") -> DataFrame:
    """As-of join: for each ``left_type`` event, the most recent
    ``right_type`` event of the same user at-or-before it.

    Spark has no native as-of join; the scalable formulation is the
    union+window trick — tag both sides, sort within user by time, carry
    the last right-side row forward. One shuffle on the join key, no
    range explosion (compare: a naive range join is O(n·m) per key).
    Timestamps are compared as µs epochs so the DuckDB ASOF JOIN oracle
    sees identical integers (the events parquet is ns-precision).

    Returns ``(event_id, user_id, ts_us, prior_event_id, prior_value)``.
    """
    ep = F.unix_micros(F.col("ts"))
    tagged = events.where(F.col("event_type").isin([left_type, right_type])).select(
        "user_id",
        "event_id",
        ep.alias("ts_us"),
        "value",
        (F.col("event_type") == right_type).cast("int").alias("is_right"),
    )
    # right rows sort before left rows at equal ts (as-of is inclusive)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts_us"), F.desc("is_right"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = tagged.withColumn(
        "prior",
        F.last(
            F.when(
                F.col("is_right") == 1,
                F.struct(F.col("event_id").alias("pid"), F.col("value").alias("pval")),
            ),
            ignorenulls=True,
        ).over(w),
    )
    return (
        carried.where(F.col("is_right") == 0)
        .select(
            "event_id",
            "user_id",
            "ts_us",
            F.col("prior.pid").alias("prior_event_id"),
            F.col("prior.pval").alias("prior_value"),
        )
    )


def orders_priority_pivot(orders: DataFrame) -> DataFrame:
    """Pivot: order counts + exact decimal totals per priority × status."""
    price = F.col("o_totalprice").cast(_D)
    statuses = ["O", "F", "P"]
    out = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", statuses)
        # count(lit(1)): star expansion is not allowed inside a pivot agg
        .agg(F.count(F.lit(1)).alias("n"), F.sum(price).alias("tp"))
    )
    cols = [F.col("o_orderpriority")]
    for s in statuses:
        cols.append(F.coalesce(F.col(f"{s}_n"), F.lit(0)).alias(f"n_{s}"))
        cols.append(
            F.coalesce(F.col(f"{s}_tp").cast("double"), F.lit(0.0)).alias(f"total_{s}")
        )
    return out.select(*cols)


def orders_grouping_sets(orders: DataFrame) -> DataFrame:
    """GROUPING SETS rollup: per-status, per-priority, and grand total."""
    spark = orders.sparkSession
    orders.createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


def lineitem_unpivot(lineitem: DataFrame) -> DataFrame:
    """Unpivot (melt) the lineitem measures into (measure, value) rows —
    values pass through untouched (bit-identical across engines)."""
    return lineitem.select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"
    ).unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount"],
        variableColumnName="measure",
        valueColumnName="value",
    )


def orders_rollup(orders: DataFrame) -> DataFrame:
    """ROLLUP hierarchy (year -> status -> grand total) with exact decimal
    sums — completes the cube / grouping-sets / rollup trio. NULL group
    values are coalesced to 'ALL' so subtotal rows hash identically
    across engines."""
    price = F.col("o_totalprice").cast(_D)
    return (
        orders.withColumn("order_year", F.year("o_orderdate").cast("string"))
        .rollup("order_year", "o_orderstatus")
        .agg(F.count("*").alias("n_orders"), F.sum(price).alias("_tp"))
        .select(
            F.coalesce("order_year", F.lit("ALL")).alias("order_year"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("o_orderstatus"),
            "n_orders",
            F.col("_tp").cast("double").alias("total_price"),
        )
    )


def customer_year_setops(orders: DataFrame, year_a: int = 1994, year_b: int = 1995) -> DataFrame:
    """Relational set operations: customers who ordered in both years
    (INTERSECT), only the first (EXCEPT), or only the second — tagged and
    unioned into one relation. The scan is shared; Catalyst plans the set
    ops as null-safe aggregating joins."""
    def buyers(year: int) -> DataFrame:
        return (
            orders.where(F.year("o_orderdate") == year)
            .select("o_custkey")
            .distinct()
        )

    a, b = buyers(year_a), buyers(year_b)
    tagged = [
        a.intersect(b).withColumn("tag", F.lit("both")),
        a.exceptAll(b).withColumn("tag", F.lit(f"only_{year_a}")),
        b.exceptAll(a).withColumn("tag", F.lit(f"only_{year_b}")),
    ]
    out = tagged[0]
    for t in tagged[1:]:
        out = out.unionByName(t)
    return out.select("tag", "o_custkey")


def lineitem_quantiles(lineitem: DataFrame) -> DataFrame:
    """Exact discrete quantiles (ANSI PERCENTILE_DISC: smallest value with
    cume_dist >= p) of extended price per return flag. Discrete quantiles
    return an actual data value — bit-exact across engines, unlike
    interpolated PERCENTILE_CONT whose arithmetic order varies.

    At 100 TB exact quantiles need a full sort per group; the approximate
    tier is ``events_approx_stats`` (t-digest/HLL-style sketches)."""
    def pd(p: float, alias: str):
        return F.expr(
            f"percentile_disc({p}) WITHIN GROUP (ORDER BY l_extendedprice)"
        ).alias(alias)

    return (
        lineitem.groupBy("l_returnflag")
        .agg(
            pd(0.25, "p25"),
            pd(0.50, "p50"),
            pd(0.75, "p75"),
            pd(0.95, "p95"),
            F.count("*").alias("n_rows"),
        )
    )


def orders_rolling_stats(orders: DataFrame) -> DataFrame:
    """Rolling-window coverage: 3-row moving average of spend (exact
    decimal sum, one final double divide), lag/lead neighbors, and ntile
    quartile position within each customer's order history."""
    price = F.col("o_totalprice").cast(_D)
    w = Window.partitionBy("o_custkey").orderBy(
        F.asc("o_orderdate"), F.asc("o_orderkey")
    )
    w3 = w.rowsBetween(-2, 0)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_totalprice").cast(_D).cast("double").alias("total_price"),
        (F.sum(price).over(w3).cast("double") / F.count("*").over(w3)).alias(
            "moving_avg_3"
        ),
        F.lag(price).over(w).cast("double").alias("prev_price"),
        F.lead(price).over(w).cast("double").alias("next_price"),
        F.ntile(4).over(w).cast("long").alias("history_quartile"),
    )


# band edges sized to the test tables' price range (900-1000) so every
# band is exercised; the operator itself is range-generic
PRICE_BANDS: list[tuple[str, float, float]] = [
    ("budget", 0.0, 920.0),
    ("mid", 920.0, 940.0),
    ("upper", 940.0, 960.0),
    ("premium", 960.0, 980.0),
    ("luxury", 980.0, 1e12),
]


def part_price_band_join(part: DataFrame) -> DataFrame:
    """Range (band) join: parts against a banded price dimension via a
    non-equi ``lo <= p_retailprice < hi`` predicate. The band table is
    tiny and broadcast, so the range join is a broadcast nested-loop scan
    — no shuffle of the fact side regardless of scale."""
    spark = part.sparkSession
    bands = spark.createDataFrame(
        PRICE_BANDS, schema="band string, lo double, hi double"
    )
    price = F.col("p_retailprice").cast(_D)
    return (
        part.join(
            F.broadcast(bands),
            (F.col("p_retailprice") >= F.col("lo"))
            & (F.col("p_retailprice") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_parts"),
            F.sum(price).alias("_sp"),
            F.min("p_retailprice").alias("min_price"),
            F.max("p_retailprice").alias("max_price"),
        )
        .select(
            "band",
            "n_parts",
            F.col("_sp").cast("double").alias("sum_price"),
            "min_price",
            "max_price",
        )
    )


def events_approx_stats(events: DataFrame) -> DataFrame:
    """Sketch-based approximate aggregation per event type: HyperLogLog++
    distinct users (relativeSD 0.01) and approximate value percentiles.

    The 100 TB path for cardinality/quantiles: sketches are fixed-size,
    mergeable partial aggregates — one shuffle of KB-sized state instead
    of a full sort / distinct expansion. No DuckDB oracle: sketch
    estimates are implementation-defined (DuckDB's HLL differs), so the
    driver applies the rows-only check; the exact twins of these numbers
    are covered by ``events_daily`` / ``lineitem_quantiles``."""
    return (
        events.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
            F.percentile_approx("value", [0.5, 0.95], 10_000).alias("_pv"),
            F.count("*").alias("n_events"),
        )
        .select(
            "event_type",
            "approx_users",
            F.col("_pv")[0].alias("approx_p50_value"),
            F.col("_pv")[1].alias("approx_p95_value"),
            "n_events",
        )
    )


def q10_returned_revenue(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    k: int = 20,
) -> DataFrame:
    """TPC-H Q10 shape: top-k customers by revenue lost to returned
    items. The return-flag filter prunes the fact scan, the orders join
    shuffles on the order key, and the customer dim broadcasts; the
    top-k is a global TakeOrdered (revenue DESC, custkey ASC tie-break —
    deterministic), never a full sort."""
    rev = F.col("l_extendedprice").cast(_D) * (
        _one() - F.col("l_discount").cast(_D)
    )
    return (
        lineitem.where(F.col("l_returnflag") == "R")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "c_mktsegment")
        .agg(
            F.sum(rev).alias("_r"),
            F.count("*").alias("n_return_items"),
        )
        .select(
            "c_custkey",
            "c_name",
            "c_mktsegment",
            F.col("_r").cast("double").alias("lost_revenue"),
            "n_return_items",
        )
        .orderBy(F.col("lost_revenue").desc(), F.col("c_custkey").asc())
        .limit(k)
    )


def q12_priority_shipclass(
    orders: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """TPC-H Q12 shape: conditional bucket counts after the fact-orders
    join — per return flag, how many line items belong to critical
    (1-URGENT / 2-HIGH) vs non-critical orders. One shuffle join keyed
    on the order key plus a map-side conditional aggregate."""
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(crit.cast("long")).alias("n_critical"),
            F.sum((~crit).cast("long")).alias("n_noncritical"),
        )
    )


def q4_order_priority(
    orders: DataFrame,
    lineitem: DataFrame,
    start: str = "1996-01-01",
    end: str = "1996-04-01",
    late_days: int = 60,
) -> DataFrame:
    """TPC-H Q4 shape: order-priority checking — per priority, how many
    orders placed inside a 3-month window have at least one late line
    item. The fixture carries no commit/receipt dates (TESTDATA.md), so
    "late" is re-expressed as ``l_shipdate >= o_orderdate + late_days``
    — the identical correlated-EXISTS decorrelation either way: a LEFT
    SEMI join hashed on the order key with the lateness residual
    evaluated join-side (each order emitted at most once, no distinct
    needed), then a 5-group count. The date window prunes the orders
    scan (pushed to the parquet reader) before anything shuffles, and
    the semi join never materializes lineitem columns."""
    late_days = int(late_days)
    windowed = orders.where(
        (F.col("o_orderdate") >= F.lit(start).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(end).cast("timestamp"))
    )
    late = F.col("l_shipdate") >= F.col("o_orderdate") + F.expr(
        f"INTERVAL {late_days} DAYS"
    )
    return (
        windowed.join(
            lineitem.select("l_orderkey", "l_shipdate"),
            (F.col("l_orderkey") == F.col("o_orderkey")) & late,
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


def q22_idle_customers(
    customer: DataFrame, orders: DataFrame, since: str = "2000-01-01"
) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average positive balance and
    no orders since ``since``, grouped by market segment. The global
    average is a scalar subquery (1-row broadcast cross join), the
    idle test a LEFT ANTI join on the distinct recent-buyer custkey set
    — both sides shrink before any wide relation moves.

    ``since`` windows the anti-join side (canonical Q22's "no orders
    ever" is vacuously empty on this fixture — every above-average
    customer has some order, so the graded relation verified nothing;
    the recent-window form exercises the identical plan shape on a
    non-empty output)."""
    avg_bal = customer.where(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast(_D)).cast("double")
            / F.count("*").cast("double")
        ).alias("_avg")
    )
    buyers = (
        orders.where(F.col("o_orderdate") >= F.lit(since).cast("timestamp"))
        .select("o_custkey")
        .distinct()
    )
    return (
        customer.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal").cast("double") > F.col("_avg"))
        .join(buyers, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(F.col("c_acctbal").cast(_D)).cast("double").alias("total_bal"),
        )
    )


def events_approx_check(
    events: DataFrame, max_rel_err: float = 0.05
) -> DataFrame:
    """Hash-checkable error-bound contract for the sketch aggregates
    (graduates ``events_approx_stats`` from rows-only grading): per event
    type, the EXACT distinct-user count plus booleans asserting that the
    HLL++ estimate (rsd 0.01) lands within ``max_rel_err`` of exact
    (a ±5σ envelope — deterministically satisfied), that the
    approximate median lands between the exact p40 and p60, and — since
    round 10, folding in the last face of ``events_approx_stats`` that
    had no graded twin — that the approximate p95 lands between the
    exact p90 and the group max. The envelopes must hold for EVERY
    group size, not just the current fixture's: ``percentile_approx``
    returns an actual data value at ~the ceil(q·N) order statistic
    (rank error ≤ N/10000 at accuracy 10,000) while exact
    ``percentile`` interpolates, so an interpolated UPPER bound tighter
    than the max (e.g. p99) can fall BELOW the returned order statistic
    on small groups and flip a boolean the oracle hard-codes TRUE; by
    the same rank arithmetic the p40 lower bound only dominates the
    median's order statistic from ~6 rows up, so it degrades to the
    group min below 10 rows. A rank check: ceil(1 + 0.4(N−1)) ≤
    ceil(0.5·N − N/10000) for N ≥ 6, and ceil(0.9N + 0.1) ≤
    ceil(0.95·N − N/10000) for all N ≥ 1, so p40/N≥10 and p90/max are
    deterministic; p60 dominates ceil(0.5N) for all N. The DuckDB
    oracle recomputes the exact values and emits literal TRUEs, so a
    sketch regression (wrong rsd, broken merge, bad accuracy) flips a
    boolean and fails the value hash.
    """
    # The exact distinct count runs in its OWN aggregation, joined back
    # on the (tiny) group key: mixing count_distinct with the other
    # aggregates triggers Spark's distinct-aggregate rewrite, which
    # keys the partial aggregation on (event_type, user_id) — a
    # percentile/HLL state object PER DISTINCT USER, then a merge of
    # all those buffers (measured 13.0 s at sf0.1 vs <1 s for each
    # aggregate alone; the split runs in ~1.5 s and the 5-row join is
    # a broadcast). Values are identical — same oracle.
    approx = F.approx_count_distinct("user_id", rsd=0.01)
    exact = F.count_distinct("user_id")
    p = F.percentile(
        "value", F.array(F.lit(0.4), F.lit(0.6), F.lit(0.9))
    )
    ap = F.percentile_approx(
        "value", F.array(F.lit(0.5), F.lit(0.95)), F.lit(10_000)
    )
    sketches = events.groupBy("event_type").agg(
        approx.alias("_hll"),
        p.alias("_p"),
        ap.alias("_ap"),
        F.min("value").alias("_min"),
        F.max("value").alias("_max"),
        # non-null count: the N>=10 gate must count the same population
        # the percentiles rank (they ignore NULL value) — counting all
        # rows could admit a group with <6 non-null values, where the
        # p40 lower bound no longer dominates the approx median's rank
        F.count("value").alias("_n"),
    )
    exact_users = events.groupBy("event_type").agg(exact.alias("n_users"))
    lo50 = F.when(F.col("_n") >= 10, F.col("_p")[0]).otherwise(
        F.col("_min")
    )
    return (
        sketches.join(F.broadcast(exact_users), "event_type")
        .select(
            "event_type",
            "n_users",
            (
                F.abs(F.col("_hll") - F.col("n_users"))
                <= F.lit(max_rel_err) * F.col("n_users")
            ).alias("hll_ok"),
            (
                (F.col("_ap")[0] >= lo50)
                & (F.col("_ap")[0] <= F.col("_p")[1])
            ).alias("p50_ok"),
            (
                (F.col("_ap")[1] >= F.col("_p")[2])
                & (F.col("_ap")[1] <= F.col("_max"))
            ).alias("p95_ok"),
        )
    )


def top_suppliers(
    supplier: DataFrame,
    nation: DataFrame,
    lineitem: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Top-k suppliers by shipped revenue, with their nation — fact scan
    against two broadcast dims (supplier and nation are small in any
    TPC-H-shaped schema; the join never shuffles lineitem)."""
    price = F.col("l_extendedprice").cast(_D)
    disc = F.col("l_discount").cast(_D)
    dims = F.broadcast(
        supplier.join(
            F.broadcast(nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        ).select("s_suppkey", "s_name", "n_name")
    )
    return (
        lineitem.join(dims, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_suppkey", "s_name", "n_name")
        .agg(
            F.sum(price * (_one() - disc)).alias("_rev"),
            F.count("*").alias("n_lineitems"),
        )
        .select(
            "s_suppkey",
            "s_name",
            "n_name",
            F.col("_rev").cast("double").alias("revenue"),
            "n_lineitems",
        )
        .orderBy(F.desc("revenue"), F.asc("s_suppkey"))
        .limit(k)
    )


def customer_trailing_spend(orders: DataFrame, days: int = 30) -> DataFrame:
    """RANGE-frame window (value-based, not row-based): each order's
    trailing ``days``-day spend for its customer. The frame is keyed on
    the integer day ordinal so the bound is a time interval, however many
    order rows fall inside it."""
    price = F.col("o_totalprice").cast(_D)
    day = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day)
        .rangeBetween(-(days - 1), 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        day.cast("long").alias("order_day"),
        F.sum(price).over(w).cast("double").alias("trailing_spend"),
        F.count("*").over(w).alias("n_orders_in_window"),
    )


def orders_above_customer_avg(orders: DataFrame) -> DataFrame:
    """Correlated scalar subquery shape: orders whose price exceeds their
    customer's average. Spelled as ``price * n > sum`` in exact decimal
    (an avg would be a double divide — boundary rows could then disagree
    between engines). Catalyst decorrelates the subqueries into an
    aggregate + join; no per-row re-execution."""
    spark = orders.sparkSession
    orders.createOrReplaceTempView("_oaca_orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_price
        FROM _oaca_orders o
        WHERE CAST(o_totalprice AS DECIMAL(18,2))
              * (SELECT count(*) FROM _oaca_orders i
                 WHERE i.o_custkey = o.o_custkey)
              > (SELECT sum(CAST(o_totalprice AS DECIMAL(18,2)))
                 FROM _oaca_orders i WHERE i.o_custkey = o.o_custkey)
        """
    )


def q6_revenue(
    lineitem: DataFrame,
    ship_from: str = "1994-01-01",
    ship_to: str = "1995-01-01",
    disc_lo: float = 0.05,
    disc_hi: float = 0.07,
    max_qty: float = 24.0,
) -> DataFrame:
    """TPC-H Q6 shape: tight filter + single-row aggregate.

    The point of this query is the *scan*: every predicate is sargable and
    reaches the parquet reader as PushedFilters (date range, discount
    band, quantity cap), so at 100 TB the job reads only row groups whose
    min/max stats overlap the band — verified by the plan audit test.
    Revenue math is exact decimal; discount comparisons stay on the raw
    double column (identical literals both engines).
    """
    price = F.col("l_extendedprice").cast(_D)
    disc = F.col("l_discount").cast(_D)
    return (
        lineitem.where(
            (F.col("l_shipdate") >= ship_from)
            & (F.col("l_shipdate") < ship_to)
            & (F.col("l_discount") >= disc_lo)
            & (F.col("l_discount") <= disc_hi)
            & (F.col("l_quantity") < max_qty)
        )
        .agg(
            F.sum(price * disc).alias("_rev"),
            F.count("*").alias("n_items"),
        )
        .select(F.col("_rev").cast("double").alias("revenue"), "n_items")
    )


def min_cost_supplier(
    part: DataFrame, supplier: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """TPC-H Q2 shape: cheapest supplier per part (correlated-min → join).

    Unit cost is min(l_extendedprice / l_quantity) over each
    (part, supplier)'s lineitems; the per-part winner is picked with a
    deterministic ``row_number`` (cost, then suppkey). The heavy agg runs
    on the fact table first — the window then sees one row per
    (part, supplier), and both dims join broadcast."""
    unit = F.col("l_extendedprice") / F.col("l_quantity")
    per_ps = (
        lineitem.where(F.col("l_quantity") > 0)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(unit).alias("unit_cost"))
    )
    w = Window.partitionBy("l_partkey").orderBy(
        F.asc("unit_cost"), F.asc("l_suppkey")
    )
    best = per_ps.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    return (
        best.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "p_partkey",
            "p_name",
            "p_brand",
            "s_suppkey",
            "s_name",
            "unit_cost",
        )
    )


def partsupp_synth(part: DataFrame, supplier: DataFrame) -> DataFrame:
    """Deterministic synthetic ``partsupp`` —
    ``(ps_partkey, ps_suppkey, ps_availqty, ps_supplycost_cents,
    ps_supplycost)`` — derived in-engine from ``part`` × 4 supplier
    slots (the TPC-H partsupp shape; TESTDATA carries no partsupp
    file, so the canonical partsupp-dependent queries synthesize the
    same relation in both engines).

    ``ps_suppkey = (p_partkey + i·(S div 4)) mod S`` for slot i∈0..3
    (distinct per part for any S ≥ 4 since 4·(S div 4) ≤ S); qty/cost
    are integer hashes of the key pair, so the relation is a pure
    deterministic function of (part, supplier-count) — identical in
    Spark and the DuckDB oracle with no data movement. Cost is carried
    in integer CENTS (``ps_supplycost_cents``) so aggregates stay
    order-independent; ``ps_supplycost = cents/100.0`` (one IEEE
    divide, bit-identical in both engines) serves comparisons and
    display.

    Scale shape: a 4× flatMap of the part dimension — parallel over
    part's partitions, no shuffle, no driver data; the supplier COUNT
    is the only driver value (a dim-table count).
    """
    s_count = supplier.count()
    if s_count < 4:
        # the 4-distinct-suppliers-per-part invariant (the partsupp
        # primary key) only holds for S >= 4 — below that, slots repeat
        # suppkeys and every downstream sum double-counts
        raise ValueError(
            f"partsupp_synth needs >= 4 suppliers (got {s_count}): "
            "ps_suppkey = (p + i*(S div 4)) mod S is distinct per part "
            "only when 4*(S div 4) <= S with a positive step"
        )
    step = max(1, s_count // 4)
    pk = F.col("ps_partkey")
    sk = F.col("ps_suppkey")
    cents = (pk * 131 + sk * 29) % 99901 + 100
    return (
        part.select(F.col("p_partkey").alias("ps_partkey"))
        .withColumn("_i", F.explode(F.sequence(F.lit(0), F.lit(3))))
        .select(
            "ps_partkey",
            ((pk + F.col("_i") * step) % s_count).alias("ps_suppkey"),
        )
        .withColumn("ps_availqty", (pk * 31 + sk * 17) % 9999 + 1)
        .withColumn("ps_supplycost_cents", cents)
        .withColumn(
            "ps_supplycost", cents.cast("double") / F.lit(100.0)
        )
    )


def q2_min_cost_supplier(
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = "EUROPE",
    p_type: str = "ECONOMY",
    size_lo: int = 10,
    size_hi: int = 30,
    limit: int = 100,
) -> DataFrame:
    """TPC-H Q2 in CANONICAL form over the synthetic partsupp
    (:func:`partsupp_synth`): for parts of a type/size band, the
    supplier(s) in a region offering the regional MINIMUM supply cost
    — the correlated scalar subquery decorrelated into a per-part min
    aggregate joined back on (partkey, cost).

    Plan shape: partsupp ⋈ supplier ⋈ nation ⋈ region restricts to the
    region FIRST (dims broadcast, nation/region prune before the fact
    relation widens), the per-part min is one hash agg over the
    regional slice, and the winners join the filtered part dim
    broadcast. Top-``limit`` by (s_acctbal desc, n_name, s_name,
    p_partkey) — a total order (supplier names unique), so the limit
    is deterministic.
    """
    ps = partsupp_synth(part, supplier)
    regional = (
        ps.join(F.broadcast(supplier), ps.ps_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.col("r_name") == region_name)
        .select(
            "ps_partkey", "ps_suppkey", "ps_supplycost_cents",
            "ps_supplycost", "s_acctbal", "s_name", "n_name",
        )
    )
    regional = _pin_local(regional)
    # explicit rename breaks the self-derived lineage: joining a frame
    # to its own aggregate on the "same" column otherwise resolves to a
    # trivially-true predicate
    mins = (
        regional.groupBy("ps_partkey")
        .agg(F.min("ps_supplycost_cents").alias("_mc"))
        .withColumnRenamed("ps_partkey", "_mk")
    )
    wanted = part.where(
        (F.col("p_type") == p_type)
        & (F.col("p_size") >= size_lo)
        & (F.col("p_size") <= size_hi)
    ).select("p_partkey", "p_brand", "p_size")
    return (
        regional.join(
            mins,
            (F.col("ps_partkey") == F.col("_mk"))
            & (F.col("ps_supplycost_cents") == F.col("_mc")),
        )
        .drop("_mk")
        .join(F.broadcast(wanted), F.col("ps_partkey") == F.col("p_partkey"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_brand",
            "p_size", "ps_suppkey", "ps_supplycost",
        )
        .orderBy(
            F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"),
            F.asc("p_partkey"),
        )
        .limit(limit)
    )


def _pin_local(df: DataFrame) -> DataFrame:
    from jaccard_mapreduce_spark.operators._cache import pin

    return pin(df)


def q11_partsupp(
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nation_name: str = "NATION_15",
    denom: int = 200,
) -> DataFrame:
    """TPC-H Q11 in CANONICAL form over the synthetic partsupp: per
    part, the total supply value held by one nation's suppliers, kept
    when it exceeds ``1/denom`` of the nation's grand total (the HAVING
    scalar-subquery shape) — ``(ps_partkey, value)``.

    All money stays in integer cents until the output projection, and
    the fraction test is the cross-multiplied integer comparison
    ``value_cents · denom > total_cents`` — no float enters the
    predicate, so the graded relation is engine-exact by construction.
    Plan: partsupp ⋈ broadcast(nation's suppliers) → one hash agg on
    partkey → 1-row total broadcast back (the q11 adapted shape, now
    on the canonical relation)."""
    ps = partsupp_synth(part, supplier)
    nat_supp = (
        supplier.join(
            F.broadcast(nation.where(F.col("n_name") == nation_name)),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    pv = (
        ps.join(F.broadcast(nat_supp), ps.ps_suppkey == F.col("s_suppkey"))
        .groupBy("ps_partkey")
        .agg(
            F.sum(
                F.col("ps_supplycost_cents") * F.col("ps_availqty")
            ).alias("_vc")
        )
    )
    total = pv.agg(F.sum("_vc").alias("_t"))
    return (
        pv.crossJoin(F.broadcast(total))
        .where(F.col("_vc") * denom > F.col("_t"))
        .select(
            "ps_partkey",
            (F.col("_vc").cast("double") / F.lit(100.0)).alias("value"),
        )
    )


def q16_partsupp(
    part: DataFrame, supplier: DataFrame, excl_brand: str = "Brand#9"
) -> DataFrame:
    """TPC-H Q16 in CANONICAL form over the synthetic partsupp: how
    many distinct suppliers can source each (brand, type, size) combo,
    excluding one brand and the "complaint" suppliers (stand-in
    predicate: negative account balance — the schema carries no comment
    column) — ``(p_brand, p_type, p_size, supplier_cnt)``.

    The exclusion is a LEFT ANTI join against the (tiny, broadcast)
    bad-supplier set; the part dim broadcasts; one distinct-count agg."""
    ps = partsupp_synth(part, supplier)
    bad = supplier.where(F.col("s_acctbal") < 0).select("s_suppkey")
    keep_parts = part.where(F.col("p_brand") != excl_brand).select(
        "p_partkey", "p_brand", "p_type", "p_size"
    )
    return (
        ps.join(
            F.broadcast(bad), ps.ps_suppkey == F.col("s_suppkey"), "left_anti"
        )
        .join(F.broadcast(keep_parts), ps.ps_partkey == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
    )


def q9_partsupp(
    lineitem: DataFrame,
    orders: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    name_pattern: str = "%ring%",
) -> DataFrame:
    """TPC-H Q9 in CANONICAL form over the synthetic partsupp: profit
    per (supplier nation, order year) with the real
    ``ps_supplycost · l_quantity`` cost term —
    ``(nation, o_year, sum_profit, n_items)``. Completes the canonical
    partsupp set (Q2/Q9/Q11/Q16/Q20 all verbatim; the adapted
    ``q9_product_profit`` keeps its key).

    Money exactness without decimal division: revenue folds in
    DECIMAL(18,2) (exact, order-free) and cost in integer CENTS
    (``ps_supplycost_cents × qty``); each sum casts to double once and
    the profit is ONE double subtraction — bit-identical in both
    engines. The (partkey, suppkey) inner join keeps only lineitems
    whose supplier is one of the part's four synthetic slots — sparse
    but deterministic, identical in the oracle.
    """
    rev = F.col("l_extendedprice").cast(_D) * (
        _one() - F.col("l_discount").cast(_D)
    )
    cost_cents = F.col("ps_supplycost_cents") * F.col("l_quantity").cast("long")
    ps = partsupp_synth(part, supplier).select(
        "ps_partkey", "ps_suppkey", "ps_supplycost_cents"
    )
    parts = part.where(F.col("p_name").like(name_pattern)).select("p_partkey")
    return (
        lineitem.join(
            F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey")
        )
        # partsupp is dim-sized (4 rows per part) — broadcast, the fact
        # relation never shuffles for the cost lookup
        .join(
            F.broadcast(ps),
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(
            F.sum(rev).alias("_r"),
            F.sum(cost_cents).alias("_c"),
            F.count("*").alias("n_items"),
        )
        .select(
            "nation",
            "o_year",
            (
                F.col("_r").cast("double")
                - F.col("_c").cast("double") / F.lit(100.0)
            ).alias("sum_profit"),
            "n_items",
        )
    )


def q20_partsupp(
    part: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    name_prefix: str = "red",
    year: int = 1997,
) -> DataFrame:
    """TPC-H Q20 in CANONICAL form over the synthetic partsupp:
    suppliers holding EXCESS stock — a partsupp entry for a
    ``name_prefix`` part whose ``ps_availqty`` exceeds half the
    quantity that (part, supplier) actually shipped in ``year`` —
    ``(s_suppkey, s_name)``.

    The correlated quantity subquery decorrelates into one fact-table
    agg keyed (partkey, suppkey); quantities are integer-valued doubles
    cast to long, and the half threshold is integer ``div 2`` — the
    comparison is engine-exact. The part-name prefix semi-joins
    broadcast before the fact agg widens anything; the final supplier
    filter is a LEFT SEMI join on the distinct excess-suppkey set."""
    shipped = (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(f"{year}-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(f"{year + 1}-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").cast("long").alias("_qty"))
    )
    wanted_parts = part.where(F.col("p_name").startswith(name_prefix)).select(
        "p_partkey"
    )
    excess = (
        partsupp_synth(part, supplier)
        .join(
            F.broadcast(wanted_parts),
            F.col("ps_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .join(
            shipped,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .where(F.col("ps_availqty") > F.expr("_qty div 2"))
        .select("ps_suppkey")
        .distinct()
    )
    return supplier.join(
        excess, F.col("s_suppkey") == F.col("ps_suppkey"), "left_semi"
    ).select("s_suppkey", "s_name")


def orders_returned_by_priority(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q4 shape: EXISTS-driven count per priority.

    The EXISTS probe is a LEFT SEMI join on the order key — lineitem
    never duplicates orders rows, and only ``l_orderkey`` of the filtered
    probe side moves through the shuffle."""
    returned = lineitem.where(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        orders.join(
            returned, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


def interval_join_events(
    events: DataFrame,
    left_type: str = "view",
    right_type: str = "click",
    window_seconds: int = 600,
) -> DataFrame:
    """Interval join: every (view, click) pair for the same user with the
    click inside ``[view_ts, view_ts + window)`` — ALL matches, unlike the
    as-of join's single nearest match (``asof_join_events``).

    Physically an equi-join on ``user_id`` with a range residual; per-user
    event lists are small so the equi-key carries the join. At 100 TB the
    scale lever is bucketing both sides by (user_id, time-bucket) so
    candidate pairs stay partition-local; the range residual is already
    sargable. Delay is exact integer micros in both engines."""
    us = F.unix_micros(F.col("ts"))
    v = events.where(F.col("event_type") == left_type).select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user"),
        us.alias("view_us"),
    )
    c = events.where(F.col("event_type") == right_type).select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        us.alias("click_us"),
    )
    win_us = F.lit(window_seconds).cast("long") * 1_000_000
    return (
        v.join(
            c,
            (F.col("v_user") == F.col("c_user"))
            & (F.col("click_us") >= F.col("view_us"))
            & (F.col("click_us") < F.col("view_us") + win_us),
        )
        .select(
            "view_id",
            "click_id",
            F.col("v_user").alias("user_id"),
            (F.col("click_us") - F.col("view_us")).alias("delay_us"),
        )
    )


def user_funnel(
    events: DataFrame,
    stages: tuple[str, str, str] = ("view", "click", "purchase"),
) -> DataFrame:
    """Ordered-funnel analysis: per user, the first time each stage was
    reached *in sequence* (first view, first click at-or-after that view,
    first purchase at-or-after that click) and the furthest stage hit.

    Three conditional-min aggregates chained on ``user_id`` — every join
    is on the same key, so after the first shuffle the exchanges are
    reused (co-partitioned); per-user event lists are tiny so no skew.
    Timestamps are exact integer micros in both engines."""
    s1, s2, s3 = stages
    us = F.unix_micros(F.col("ts"))
    base = events.select("user_id", "event_type", us.alias("us"))
    f1 = base.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == s1, F.col("us"))).alias("first_view_us")
    )
    f2 = (
        base.join(f1, "user_id")
        .where(
            (F.col("event_type") == s2) & (F.col("us") >= F.col("first_view_us"))
        )
        .groupBy("user_id")
        .agg(F.min("us").alias("first_click_us"))
    )
    f3 = (
        base.join(f2, "user_id")
        .where(
            (F.col("event_type") == s3) & (F.col("us") >= F.col("first_click_us"))
        )
        .groupBy("user_id")
        .agg(F.min("us").alias("first_purchase_us"))
    )
    return (
        f1.join(f2, "user_id", "left")
        .join(f3, "user_id", "left")
        .select(
            "user_id",
            "first_view_us",
            "first_click_us",
            "first_purchase_us",
            F.when(F.col("first_purchase_us").isNotNull(), F.lit(s3))
            .when(F.col("first_click_us").isNotNull(), F.lit(s2))
            .when(F.col("first_view_us").isNotNull(), F.lit(s1))
            .otherwise(F.lit("none"))
            .alias("stage_reached"),
        )
    )


def events_hopping_counts(
    events: DataFrame, window_seconds: int = 3600, slide_seconds: int = 1800
) -> DataFrame:
    """Hopping (sliding) window counts per event type: each event lands in
    ``window/slide`` overlapping windows (``F.window`` with a slide).

    The overlap factor multiplies rows BEFORE the aggregate, but partial
    aggregation collapses them map-side, so the shuffle carries one row
    per (window, type) per partition — same scale posture as the tumbling
    ``events_daily``. Epoch-aligned starts, exact decimal sums."""
    assert window_seconds % slide_seconds == 0
    return (
        events.groupBy(
            F.window("ts", f"{window_seconds} seconds", f"{slide_seconds} seconds").alias("w"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("_sv"),
        )
        .select(
            F.unix_micros("w.start").alias("window_start_us"),
            "event_type",
            "n_events",
            F.col("_sv").cast("double").alias("sum_value"),
        )
    )


def q7_nation_volume(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """TPC-H Q7 shape: cross-nation trade volume by year.

    The fact chain (lineitem → orders → customer) shuffles on its join
    keys once; supplier and BOTH nation roles broadcast (the same dim
    under two aliases — supplier's nation and customer's nation). The
    inequality filter keeps only cross-border flows. Revenue is exact
    decimal; ship_year is cast long to match the oracle's BIGINT.
    """
    rev = F.col("l_extendedprice").cast(_D) * (
        _one() - F.col("l_discount").cast(_D)
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(F.sum(rev).alias("_v"), F.count("*").alias("n_items"))
        .select(
            "supp_nation",
            "cust_nation",
            "ship_year",
            F.col("_v").cast("double").alias("volume"),
            "n_items",
        )
    )


def q14_promo_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    ship_from: str = "1995-09-01",
    ship_to: str = "1995-10-01",
) -> DataFrame:
    """TPC-H Q14 shape: conditional-aggregate ratio (promo revenue share
    in a ship month). One broadcast dim join + one scan-tight aggregate;
    the percentage is a single double division of two exact decimal sums
    — identical operand order in the oracle."""
    rev = F.col("l_extendedprice").cast(_D) * (
        _one() - F.col("l_discount").cast(_D)
    )
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast(_D)
    )
    return (
        lineitem.where(
            (F.col("l_shipdate") >= ship_from) & (F.col("l_shipdate") < ship_to)
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(F.sum(promo).alias("_p"), F.sum(rev).alias("_t"))
        .select(
            (
                F.lit(100.0)
                * F.col("_p").cast("double")
                / F.col("_t").cast("double")
            ).alias("promo_pct"),
            F.col("_p").cast("double").alias("promo_revenue"),
            F.col("_t").cast("double").alias("total_revenue"),
        )
    )


def q18_large_orders(
    orders: DataFrame,
    customer: DataFrame,
    lineitem: DataFrame,
    min_qty: float = 300.0,
) -> DataFrame:
    """TPC-H Q18 shape: HAVING-filtered aggregate driving a top join.

    The quantity rollup runs FIRST on the fact table (partial agg
    map-side), the HAVING filter shrinks it to the few large orders, and
    only then do orders/customer join — the survivors are small enough
    that both joins broadcast the aggregated side at any scale."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(_D)).alias("_q"))
        .where(F.col("_q") > F.lit(min_qty).cast(_D))
    )
    return (
        orders.join(F.broadcast(big), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").cast("string").alias("order_date"),
            "o_totalprice",
            F.col("_q").cast("double").alias("sum_qty"),
        )
    )


Q19_BANDS: list[tuple[str, int, int, float, float]] = [
    # (brand, size_lo, size_hi, qty_lo, qty_hi)
    ("Brand#12", 1, 15, 1.0, 11.0),
    ("Brand#23", 1, 25, 10.0, 20.0),
    ("Brand#20", 1, 35, 20.0, 30.0),
]


def q19_disjunctive_revenue(
    lineitem: DataFrame, part: DataFrame
) -> DataFrame:
    """TPC-H Q19 shape: disjunction of multi-column conjuncts across the
    join. Catalyst pushes the common sub-predicates to each side of the
    join (brand/size bands to the part scan, quantity bands to the
    lineitem scan) and evaluates the residual OR after the broadcast
    join — the pattern that breaks naive pushdown implementations."""
    cond = None
    for brand, slo, shi, qlo, qhi in Q19_BANDS:
        c = (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(slo, shi)
            & F.col("l_quantity").between(qlo, qhi)
        )
        cond = c if cond is None else (cond | c)
    rev = F.col("l_extendedprice").cast(_D) * (
        _one() - F.col("l_discount").cast(_D)
    )
    return (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .where(cond)
        .agg(F.sum(rev).alias("_r"), F.count("*").alias("n_items"))
        .select(F.col("_r").cast("double").alias("revenue"), "n_items")
    )


def q17_small_quantity_revenue(
    lineitem: DataFrame, part: DataFrame, qty_frac: float = 0.2
) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery — each lineitem is
    compared against the average quantity OF ITS OWN PART — generalized
    to a per-brand result (the classic query fixes one brand/container
    and emits a single number; grouping by brand keeps the identical
    correlated-average structure with a 25x richer checkable output).

    Spark-first decorrelation: the per-part average is ONE aggregate
    over the fact table, joined back on the part key. Both the
    aggregate and the join shuffle on ``l_partkey``, so Catalyst reuses
    a single exchange for the subtree; the correlated subquery a naive
    engine would re-execute per row becomes one co-partitioned join.
    The part dim broadcasts for the brand attribution.

    avg_yearly follows the oracle-parity money rules: exact decimal
    sums, one double division at the output (÷ 7.0 mirrors TPC-H Q17's
    yearly normalization constant).
    """
    part_avg = lineitem.groupBy("l_partkey").agg(
        (
            F.sum(F.col("l_quantity").cast(_D)).cast("double")
            / F.count("*").cast("double")
        ).alias("_avg_qty")
    )
    small = lineitem.join(part_avg, "l_partkey").where(
        F.col("l_quantity").cast("double")
        < F.lit(qty_frac) * F.col("_avg_qty")
    )
    return (
        small.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.sum(F.col("l_extendedprice").cast(_D)).alias("_s"),
            F.count("*").alias("n_small_items"),
        )
        .select(
            "p_brand",
            (F.col("_s").cast("double") / F.lit(7.0)).alias("avg_yearly"),
            "n_small_items",
        )
    )


def q20_dominant_suppliers(
    supplier: DataFrame,
    nation: DataFrame,
    lineitem: DataFrame,
    part: DataFrame,
    name_pat: str = "%widget%",
    ship_from: str = "1996-01-01",
    ship_to: str = "1997-01-01",
    share: float = 0.5,
    max_nationkey: int = 13,
) -> DataFrame:
    """TPC-H Q20 shape: nested semi-join chain — suppliers qualified by
    a subquery that is itself qualified by two more subqueries (part
    name filter -> per-(part, supplier) shipped volume -> per-part
    total). The classic query's ``partsupp.ps_availqty`` has no analog
    in this schema, so the quantity test is re-grounded on lineitem:
    a supplier qualifies if it shipped MORE THAN ``share`` of some
    matching part's total volume in the window (a "dominant supplier"
    — same nested-aggregate-in-semi-join plan shape, same >0.5x
    comparison).

    Plan: the part-name filter broadcasts into the fact scan (date range
    + partkey semi-filter pushed down), ONE aggregate produces the
    per-(part, supplier) volumes, and the per-part total is a window sum
    over that already-shrunken relation — the fact table is scanned
    exactly once (the aggregate-then-self-join form executed the
    windowed scan twice; static and AQE exchange reuse both failed to
    merge the two aggregate subtrees, measured). The surviving supplier
    keys reach the supplier dim as a LEFT SEMI join, and the nation
    filter broadcasts. Nothing wide moves except that single fact scan.
    """
    target_parts = part.where(F.col("p_name").like(name_pat)).select(
        "p_partkey"
    )
    shipped = (
        lineitem.where(
            (F.col("l_shipdate") >= ship_from)
            & (F.col("l_shipdate") < ship_to)
        )
        .join(
            F.broadcast(target_parts),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast(_D)).alias("_q"))
    )
    dominant = (
        shipped.withColumn(
            "_tot", F.sum("_q").over(Window.partitionBy("l_partkey"))
        )
        .where(
            F.col("_q").cast("double")
            > F.lit(share) * F.col("_tot").cast("double")
        )
        .select("l_suppkey")
    )
    return (
        supplier.join(
            F.broadcast(
                nation.where(F.col("n_nationkey") < max_nationkey)
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            dominant, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
        )
        .select("s_suppkey", "s_name", "n_name")
    )


def q8_market_share(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    part: DataFrame,
    target_region: str = "ASIA",
    target_nation: str = "NATION_5",
    part_type: str = "PROMO",
) -> DataFrame:
    """TPC-H Q8 shape: a nation's market share — the fraction of yearly
    PROMO-part revenue, among orders placed by customers of one region,
    that was supplied by one nation. Nested aggregation: the inner
    per-order-line revenue rolls up per year twice (conditionally for
    the target nation, unconditionally for the denominator) in ONE
    aggregate pass.

    Plan shape: all five dimension sides (part filtered by type,
    supplier+nation, customer+nation+region) broadcast; lineitem and
    orders join on the order key — the only wide shuffle. The share is
    a single double division of two exact decimal sums (identical
    operand order in the oracle).
    """
    rev = F.col("l_extendedprice").cast(_D) * (
        _one() - F.col("l_discount").cast(_D)
    )
    cust_region = F.broadcast(
        customer.join(
            nation, F.col("c_nationkey") == F.col("n_nationkey")
        )
        .join(
            region.where(F.col("r_name") == target_region),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey")
    )
    supp_nation = F.broadcast(
        supplier.join(
            nation.select(
                F.col("n_nationkey").alias("sn_key"),
                F.col("n_name").alias("supp_nation"),
            ),
            F.col("s_nationkey") == F.col("sn_key"),
        ).select("s_suppkey", "supp_nation")
    )
    target_rev = F.when(
        F.col("supp_nation") == target_nation, rev
    ).otherwise(F.lit(0).cast(_D))
    return (
        lineitem.join(
            F.broadcast(part.where(F.col("p_type") == part_type)),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust_region, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp_nation, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(target_rev).alias("_t"),
            F.sum(rev).alias("_a"),
        )
        .select(
            "o_year",
            (
                F.col("_t").cast("double") / F.col("_a").cast("double")
            ).alias("mkt_share"),
            F.col("_a").cast("double").alias("total_revenue"),
        )
        .orderBy("o_year")
    )


def q13_customer_distribution(
    customer: DataFrame, orders: DataFrame
) -> DataFrame:
    """TPC-H Q13 shape: two-level aggregation with an outer join —
    the distribution of customers by how many orders they placed,
    INCLUDING zero-order customers (the row the inner join silently
    drops). The classic comment-pattern filter has no analog column
    here and is omitted.

    Spark-first plan: orders pre-aggregate per custkey FIRST (partial
    agg map-side shrinks the shuffle to one row per buying customer),
    then LEFT-join customer and coalesce the missing counts to 0 —
    the fact table never shuffles at full width. The second aggregate
    is over at most |distinct order counts| rows."""
    ord_counts = orders.groupBy("o_custkey").agg(
        F.count("*").alias("_n")
    )
    per_cust = customer.join(
        ord_counts, F.col("c_custkey") == F.col("o_custkey"), "left"
    ).select(F.coalesce("_n", F.lit(0)).alias("c_count"))
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def q15_top_supplier(
    supplier: DataFrame,
    lineitem: DataFrame,
    ship_from: str = "1996-01-01",
    ship_to: str = "1996-04-01",
) -> DataFrame:
    """TPC-H Q15 shape: scalar-subquery maximum over a derived revenue
    view — the supplier(s) whose windowed shipped revenue equals the
    global max. The revenue view aggregates once; its single-row max
    broadcasts back over the same (already tiny) relation, so the
    fact table is scanned exactly once. Revenue equality is exact
    (decimal sums), so the max-tie semantics match the oracle's
    scalar subquery bit-for-bit."""
    rev = (
        lineitem.where(
            (F.col("l_shipdate") >= ship_from)
            & (F.col("l_shipdate") < ship_to)
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(_D)
                * (_one() - F.col("l_discount").cast(_D))
            ).alias("_r")
        )
    )
    mx = rev.agg(F.max("_r").alias("_mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("_r") == F.col("_mx"))
        .join(
            F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .select(
            "s_suppkey",
            "s_name",
            F.col("_r").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


def q16_part_supplier_variety(
    part: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    excl_brand: str = "Brand#9",
) -> DataFrame:
    """TPC-H Q16 shape: distinct-count aggregation with a NOT-IN
    exclusion — how many distinct suppliers shipped each
    (brand, type, size) outside one excluded brand, excluding
    "complained-about" suppliers. This schema has no partsupp table or
    comment column, so the part-supplier relation is lineitem and the
    complaint stand-in is a negative account balance.

    Plan: both dims broadcast (part filtered before the shuffle, the
    bad-supplier list as a LEFT ANTI build side); the only wide
    operation is the distinct-count aggregate, which Spark runs as a
    two-phase partial-distinct expand over (group keys, suppkey)."""
    bad = supplier.where(F.col("s_acctbal") < 0).select("s_suppkey")
    pairs = (
        lineitem.join(
            F.broadcast(part.where(F.col("p_brand") != excl_brand)),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            F.broadcast(bad),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
    )
    return (
        pairs.groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"), "p_brand", "p_type", "p_size"
        )
    )


def q21_waiting_suppliers(
    supplier: DataFrame,
    nation: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    k: int = 20,
) -> DataFrame:
    """TPC-H Q21 shape: multi-way semi/anti self-join on the fact table.
    The classic query finds the sole late supplier of a multi-supplier
    order (EXISTS another supplier's item / NOT EXISTS another late
    one); this schema has no commit/receipt dates, so "late" is
    re-grounded on the return flag: count, per supplier, the 'R' line
    items in finished orders where at least one other supplier shipped
    (EXISTS) and no other supplier's item was returned (NOT EXISTS) —
    the supplier solely responsible for the order's returns.

    Spark-first decorrelation: both correlated EXISTS subqueries
    collapse into ONE per-order aggregate — ``n_supp`` (distinct
    suppliers) and ``n_ret_supp`` (distinct suppliers with a return);
    ``EXISTS(other supplier)`` ⇔ ``n_supp > 1`` and ``NOT EXISTS(other
    returned supplier)`` ⇔ ``n_ret_supp == 1`` given the probe row is
    itself returned. The oracle runs the literal double-EXISTS SQL, so
    the rewrite's equivalence is value-hash-checked. All three
    fact-side relations key on ``l_orderkey``, so at fact scale the
    joins co-partition on one shuffle key (at test scale Catalyst
    instead broadcasts the filter-shrunken aggregate — either plan is
    size-appropriate); the supplier/nation dims broadcast; top-k is a
    TakeOrdered with a unique (numwait DESC, s_suppkey ASC) sort —
    deterministic.
    """
    per_order = lineitem.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("_ns"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("_nr"),
    )
    sole_blame = (
        lineitem.where(F.col("l_returnflag") == "R")
        .join(
            orders.where(F.col("o_orderstatus") == "F").select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            per_order.where((F.col("_ns") > 1) & (F.col("_nr") == 1)),
            "l_orderkey",
        )
    )
    return (
        sole_blame.join(
            F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .join(
            F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .groupBy("s_suppkey", "s_name", "n_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_suppkey"))
        .limit(k)
    )


def q9_product_profit(
    lineitem: DataFrame,
    orders: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    part: DataFrame,
    name_pattern: str = "%ring%",
) -> DataFrame:
    """TPC-H Q9 shape: product-line profit by supplier nation and order
    year. The testdata schema carries no ``partsupp``, so supply cost is
    adapted to ``p_retailprice * l_quantity`` (the same
    cost-against-revenue algebra; DocumentSimilarityDriver has no
    relational tier at all — this is engine-extension surface).

    Plan: the part filter broadcasts and prunes the fact scan first
    (LIKE on the tiny dim, then a broadcast semi-ish join); lineitem →
    orders shuffles once on orderkey; supplier and nation broadcast.
    Profit is exact decimal end to end, cast to double only in the
    output projection.
    """
    rev = F.col("l_extendedprice").cast(_D) * (
        _one() - F.col("l_discount").cast(_D)
    )
    cost = F.col("p_retailprice").cast(_D) * F.col("l_quantity").cast(_D)
    parts = part.where(F.col("p_name").like(name_pattern)).select(
        "p_partkey", "p_retailprice"
    )
    return (
        lineitem.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(rev - cost).alias("_p"), F.count("*").alias("n_items"))
        .select(
            "nation",
            "o_year",
            F.col("_p").cast("double").alias("sum_profit"),
            "n_items",
        )
    )


def q11_value_concentration(
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nation_name: str = "NATION_3",
    fraction: str = "0.001",
) -> DataFrame:
    """TPC-H Q11 shape: per-part value concentration for one nation's
    suppliers, kept only where a part's value exceeds ``fraction`` of
    the nation total (the scalar-subquery-in-HAVING shape). ``partsupp``
    is absent from the testdata, so value is the shipped revenue of the
    nation's suppliers per part — identical query algebra.

    Plan: supplier⋈nation filter broadcasts into the fact scan; ONE
    aggregation builds the per-part value relation; its one-row total
    broadcasts back over it (crossJoin of a 1-row aggregate — the
    q15_top_supplier pattern). The threshold comparison stays in exact
    decimal (fraction is a decimal literal, never a float), so keep/drop
    membership matches the oracle bit-for-bit.
    """
    rev = F.col("l_extendedprice").cast(_D) * (
        _one() - F.col("l_discount").cast(_D)
    )
    supp = supplier.join(
        F.broadcast(nation.where(F.col("n_name") == nation_name)),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey")
    v = (
        lineitem.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(rev).alias("_v"))
    )
    frac = F.expr(f"CAST({fraction} AS DECIMAL(10,6))")
    total = v.agg(F.sum("_v").alias("_t"))
    return (
        v.crossJoin(F.broadcast(total))
        .where(F.col("_v") > F.col("_t") * frac)
        .select("partkey", F.col("_v").cast("double").alias("value"))
    )


def cohort_retention(events: DataFrame, epoch: str = "2024-01-01") -> DataFrame:
    """Weekly cohort-retention triangle —
    ``(cohort_week, week_offset, n_users)``: users whose FIRST event
    fell in ``cohort_week`` and who were active again ``week_offset``
    weeks later (offset 0 = the cohort's own size).

    Weeks are integer 7-day buckets from a fixed ``epoch`` date rather
    than calendar ISO weeks: ``(date - epoch) div 7`` is exact integer
    arithmetic in every engine, where engine ``date_trunc('week')``
    boundary conventions have historically differed.

    Plan: one min-aggregate per user (the cohort), joined back to the
    per-(user, week) distinct activity — both shuffles keyed by
    ``user_id``, so the join piggybacks the same exchange; the final
    aggregate is over the tiny (cohort, offset) grid.
    """
    week = F.floor(
        F.datediff(F.col("ts").cast("date"), F.lit(epoch).cast("date")) / 7
    ).cast("long")
    activity = events.select("user_id", week.alias("week")).distinct()
    cohorts = activity.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        activity.join(cohorts, "user_id")
        .select(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def customer_order_gaps(orders: DataFrame) -> DataFrame:
    """Inter-order gap statistics per customer —
    ``(o_custkey, n_orders, min_gap_days, max_gap_days, avg_gap_days)``
    over the day gaps between CONSECUTIVE orders (lag window; order-date
    ties broken by order key so the sequence is deterministic).
    Customers with a single order report zero gaps and NULL min/max/avg.

    The churn-risk shape: one window pass partitioned by the
    high-cardinality customer key (no skew), then a per-customer
    aggregate that piggybacks the same exchange. Gaps are exact integer
    day arithmetic; the average divides two exact integers.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gap = F.datediff(
        F.col("o_orderdate").cast("date"),
        F.lag(F.col("o_orderdate").cast("date")).over(w),
    ).cast("long")
    return (
        orders.select("o_custkey", "o_orderdate", "o_orderkey")
        .withColumn("gap", gap)
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("gap").alias("min_gap_days"),
            F.max("gap").alias("max_gap_days"),
            (
                F.sum("gap").cast("double") / F.count("gap")
            ).alias("avg_gap_days"),
        )
    )
