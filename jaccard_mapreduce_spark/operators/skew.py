"""Skew-mitigation utilities: salted joins for hot keys.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
`session.get_spark`) handles most skew at runtime by splitting oversized
shuffle partitions — but it only sees *sort-merge shuffle* joins with
runtime statistics. Manual salting remains the tool when (a) the skewed
side feeds a stream-static join AQE can't re-plan, (b) the hot key is
known a priori and the dim side is small enough to replicate but too big
to broadcast, or (c) a single key exceeds what one split can hold.

The pattern: replicate every dim row ``n_salt`` times with a salt column
(0..n_salt-1); tag each fact row with a *deterministic* salt derived from
its whole row; join on ``(key, salt)``. A key whose fact rows previously
landed in one shuffle partition now spreads over ``n_salt`` partitions;
each still finds its dim row because the dim side carries all salts.
Inner/left-outer semantics are unchanged (proved by the equivalence
test and the plain-join DuckDB oracle for the demo query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SALT = "_salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``fact`` to ``dim`` on the named key columns with the dim side
    replicated across ``n_salt`` salts.

    The fact-side salt is a deterministic hash of the full row, so the
    result (and the oracle comparison) is reproducible; any
    uniform-enough assignment works — the salt only spreads rows, it
    carries no semantics. Cost: dim rows × n_salt replication (an
    explode, no shuffle of the dim needed beyond the join's own) traded
    against eliminating the single-partition hot key.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    salt_f = F.pmod(
        F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salt)
    ).cast("int")
    f = fact.withColumn(_SALT, salt_f)
    d = dim.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)).cast("array<int>"))
    )
    return f.join(d, on + [_SALT], how).drop(_SALT)


def salted_customer_revenue(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """Demo/contract query: per-nation order counts and revenue through a
    ``salted_join`` — the DuckDB oracle is the PLAIN join, proving the
    salt changes the physical plan only.

    (At this dim size a broadcast would win — the query exists to pin the
    salted plan's correctness; the technique targets dims that are too
    big to broadcast under a skewed fact key.)"""
    f = orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price_d"),
    )
    d = customer.select(
        F.col("c_custkey").alias("custkey"), F.col("c_nationkey")
    )
    joined = salted_join(f, d, on=["custkey"], n_salt=8)
    return joined.groupBy("c_nationkey").agg(
        F.count("*").alias("n_orders"),
        F.sum("price_d").cast("double").alias("revenue"),
    )


def key_skew_stats(
    df: DataFrame, key_col: str, k: int = 20
) -> DataFrame:
    """Heavy-hitter diagnosis for a prospective shuffle key —
    ``(rank, key, n_rows, share_bp)``: the top-``k`` key values by row
    count with their integer basis-point share of the table. The
    pre-flight a 100 TB ``groupBy``/``join`` wants: a key whose top
    value holds 30% of the rows needs salting or an AQE skew split
    BEFORE the job runs, not after it straggles.

    The diagnosis itself is shuffle-safe under the very skew it
    detects: the count is a hash aggregate with map-side partial
    combine (each executor pre-reduces its own rows of the hot key to
    ONE row before the exchange), and everything after the count is
    key-cardinality-sized. Ties rank by key string ascending —
    deterministic, hash-graded.

    Two scale fixes from the round-7 review (output unchanged):

    * The per-key count relation is PINNED — its two consumers (the
      top-``k`` branch and the total-row-count branch) otherwise each
      rebuild the aggregate from a full scan of the diagnosed table,
      i.e. TWO passes over a 100 TB input for one pre-flight. The pin
      is key-cardinality-sized (two skinny columns) and spills;
      tests/test_plans.py asserts the final plan scans the source once.
    * The ranking pre-prunes with ``orderBy().limit(k)`` — Spark
      compiles that to ``TakeOrderedAndProject`` (per-partition top-k,
      driver-side merge of k·partitions rows), so only ``k`` rows ever
      reach the global ``row_number`` window. The previous shape ranked
      the ENTIRE key-cardinality relation through an unpartitioned
      window: one task sorting every distinct key, the exact
      single-partition WindowExec round 5 removed from the vocabulary
      query. The (``n_rows`` desc, ``key`` asc) order is total, so the
      limit is deterministic and the ranks are unchanged."""
    from jaccard_mapreduce_spark.operators._cache import pin as _pin

    c = _pin(
        df.groupBy(F.col(key_col).cast("string").alias("key")).agg(
            F.count(F.lit(1)).alias("n_rows")
        )
    )
    total = c.agg(F.sum("n_rows").alias("total"))
    top = c.orderBy(F.desc("n_rows"), F.asc("key")).limit(k)
    w = Window.orderBy(F.desc("n_rows"), F.asc("key"))
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .crossJoin(F.broadcast(total))
        .select(
            "rank",
            "key",
            "n_rows",
            F.expr("(10000 * n_rows) div total").alias("share_bp"),
        )
    )
