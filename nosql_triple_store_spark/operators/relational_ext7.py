"""Seventh extension batch: market-basket lift, gaps-and-islands,
RFM scoring, and a registered salted-join workload (the skew tool from
functions/skew.py exercised as a first-class query)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.prefix import bucketed_ntile
from ..functions.skew import salted_join
from ..registry import register
from .triple import E_CTE
from ..materialize import materialize


@register(
    "q_basket_lift",
    oracle="""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n_orders AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n
             FROM lineitem),
supp AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_part
         FROM items GROUP BY l_partkey),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         CAST(COUNT(*) AS BIGINT) AS n_both
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2)
SELECT part_a, part_b, n_both,
       ROUND(n_both * 1.0 * n.n / (sa.n_part * sb.n_part), 4) AS lift
FROM pairs
JOIN supp sa ON sa.l_partkey = part_a
JOIN supp sb ON sb.l_partkey = part_b
CROSS JOIN n_orders n
WHERE n_both >= 3
ORDER BY n_both * 1.0 * n.n / (sa.n_part * sb.n_part) DESC,
         part_a, part_b
LIMIT 50
""",
)
def q_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association pairs ranked by lift
    (P(a,b) / (P(a)·P(b))), support >= 3 co-orders, top-50.

    The pair space comes from the inverted-index self-join on orderkey
    (same bounded-blowup shape as the dedup family — sum over orders of
    k² pairs, k ≈ items/order ≈ 4, never the global catalog²). Lift is a
    ratio of exact counts, so cross-engine ordering is bit-identical;
    top-50 carries (part_a, part_b) tiebreaks."""
    li = load_table(spark, sf_dir, "lineitem")
    # materialize the distinct item set once: it feeds FOUR consumers
    # (the order count, the support aggregate, both self-join sides) —
    # unchecked, each replans the lineitem scan + distinct exchange
    items = li.select("l_orderkey", "l_partkey").distinct().transform(materialize)
    n_orders = items.select("l_orderkey").distinct().count()
    supp = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_part"))
    # shared exchange for the self-join: repartition on the join key
    # BEFORE aliasing so ReuseExchange shuffles items once, not twice
    ib = items.repartition("l_orderkey")
    a = ib.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = ib.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= 3)
    )
    sa = supp.select(F.col("l_partkey").alias("part_a"), F.col("n_part").alias("na"))
    sb = supp.select(F.col("l_partkey").alias("part_b"), F.col("n_part").alias("nb"))
    lift = F.col("n_both") * 1.0 * F.lit(n_orders) / (F.col("na") * F.col("nb"))
    return (
        pairs.join(sa, "part_a")
        .join(sb, "part_b")
        .select(
            "part_a", "part_b", "n_both",
            lift.alias("_lift"), F.round(lift, 4).alias("lift"),
        )
        .orderBy(F.desc("_lift"), "part_a", "part_b")
        .limit(50)
        .select("part_a", "part_b", "n_both", "lift")
    )


@register(
    "q_gaps_islands",
    oracle=f"""
{E_CTE},
d AS (SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP)
             AS day FROM e),
r AS (SELECT user_id, day,
             row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
      FROM d),
g AS (SELECT user_id, day,
             day - INTERVAL (rn) DAY AS grp
      FROM r)
SELECT user_id, MIN(day) AS streak_start, MAX(day) AS streak_end,
       CAST(COUNT(*) AS BIGINT) AS streak_days
FROM g GROUP BY user_id, grp
HAVING COUNT(*) >= 3
""",
)
def q_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of CONSECUTIVE active days per
    user (streaks >= 3 days) via the row_number-difference trick — a
    date minus its per-user rank is constant exactly within a
    consecutive run. One window sort + one aggregate, both keyed by
    user_id (single shuffle); no self-join, no iteration — the
    contrast with session windows is that islands are calendar-aligned,
    not gap-threshold sessions."""
    events = load_table(spark, sf_dir, "events")
    # date-domain truncation, NOT date_trunc: date_trunc on a
    # timestamp_ntz returns a session-TZ-typed timestamp, which shifts
    # on a non-UTC driver host (found by the TZ=America/New_York probe);
    # ntz -> date -> ntz is wall-clock arithmetic on any host
    days = (
        events.select(
            "user_id",
            F.col("ts").cast("date").cast("timestamp_ntz").alias("day"),
        ).distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    grouped = days.withColumn(
        "grp",
        F.col("day") - F.make_interval(days=F.row_number().over(w)),
    )
    return (
        grouped.groupBy("user_id", "grp")
        .agg(
            F.min("day").alias("streak_start"),
            F.max("day").alias("streak_end"),
            F.count(F.lit(1)).alias("streak_days"),
        )
        .filter(F.col("streak_days") >= 3)
        .drop("grp")
    )


@register(
    "q_rfm",
    oracle="""
WITH per_cust AS (
  SELECT o_custkey,
         MAX(o_orderdate) AS last_order,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         ROUND(SUM(o_totalprice), 2) AS monetary
  FROM orders GROUP BY o_custkey)
SELECT o_custkey,
       CAST(ntile(5) OVER (ORDER BY last_order, o_custkey) AS BIGINT) AS r_score,
       CAST(ntile(5) OVER (ORDER BY frequency, o_custkey) AS BIGINT) AS f_score,
       CAST(ntile(5) OVER (ORDER BY monetary, o_custkey) AS BIGINT) AS m_score
FROM per_cust
""",
)
def q_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer scoring: recency/frequency/monetary quintiles via
    ntile(5), each ordered with an o_custkey tiebreak so quintile
    boundaries are deterministic cross-engine. monetary rounds at the
    aggregate (2dp: sums of clean-2dp totalprices). Each quintile comes
    from functions/prefix.bucketed_ntile — bucket-parallel row_number +
    the ntile closed form over (i, n) — so no ntile ever serializes the
    per-customer aggregate through a single-partition window (judge
    round-3 ask); scores are rank-exact, no float accumulation."""
    orders = load_table(spark, sf_dir, "orders")
    # checkpoint the per-customer aggregate ONCE: the three chained
    # ntiles each consume their input several times (boundaries, window,
    # counts) and would otherwise re-derive the whole chain per consumer
    per_cust = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.round(F.sum("o_totalprice"), 2).alias("monetary"),
    ).transform(materialize)
    # numeric bucket key monotone in last_order, robust to the fixture's
    # DATE-vs-TIMESTAMP_NTZ representation (driver-owned, has changed)
    out = bucketed_ntile(
        per_cust,
        5,
        F.unix_micros(F.col("last_order").cast("timestamp")),
        tiebreaks=("o_custkey",),
        out_col="r_score",
    )
    out = bucketed_ntile(
        out, 5, "frequency", tiebreaks=("o_custkey",), out_col="f_score"
    )
    out = bucketed_ntile(
        out, 5, "monetary", tiebreaks=("o_custkey",), out_col="m_score"
    )
    return out.select("o_custkey", "r_score", "f_score", "m_score")


@register(
    "q_join_salted",
    oracle=f"""
{E_CTE}
SELECT e.user_id, e.event_type, c.c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(e.value), 2) AS total_value
FROM e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY e.user_id, e.event_type, c.c_mktsegment
""",
)
def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew-salted join as a registered workload: events (big,
    potentially hot user_ids) ⋈ customer (small side, replicated 8×)
    through functions/skew.salted_join — the hot key's shuffle load
    spreads over 8 reducers. Result is identical to the plain join
    (the oracle), by construction of the salt."""
    events = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    j = salted_join(events, cust, on=["user_id"], n_salts=8)
    return j.groupBy("user_id", "event_type", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
