"""Sixth extension batch: skyline (Pareto frontier), funnel analysis,
cohort retention, weighted median — product-analytics operators a
training-data/analytics pipeline runs at scale.

Differential-testing note: each Spark implementation deliberately uses a
DIFFERENT algorithm than its DuckDB oracle (window-sweep vs NOT EXISTS
for skyline; staged joins vs chained CTEs for the funnel) so a match is
evidence of semantics, not of shared code."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .triple import E_CTE


@register(
    "q_skyline",
    oracle="""
SELECT p_partkey, p_size, ROUND(p_retailprice, 2) AS p_retailprice
FROM part t
WHERE NOT EXISTS (
  SELECT 1 FROM part u
  WHERE u.p_size <= t.p_size AND u.p_retailprice <= t.p_retailprice
    AND (u.p_size < t.p_size OR u.p_retailprice < t.p_retailprice))
""",
)
def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier): parts where no other part is both
    smaller and cheaper (minimize p_size, p_retailprice; one strict).

    Spark side is a sort-sweep, not the oracle's quadratic NOT EXISTS:
    a part is dominated iff min(price) over strictly-smaller sizes is
    <= its price, or a same-size part is strictly cheaper (group min).
    The smaller-size min is computed WITHOUT a global single-partition
    window (the naive Window.orderBy would serialize the whole table
    through one task at 100 TB): sizes are bucketed, the RANGE-frame
    sweep runs per bucket in parallel, and cross-bucket information is
    a per-bucket min — a tiny aggregate whose strictly-before running
    min broadcasts back. O(n log n) total vs the oracle's O(n^2)
    self-join; price comparisons are on raw stored doubles so both
    engines compare identical bits."""
    part = load_table(spark, sf_dir, "part")
    bucket = F.floor((F.col("p_size") - 1) / 5)
    w_lt_local = (
        Window.partitionBy("__b")
        .orderBy("p_size")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_eq = Window.partitionBy("p_size")
    # per-bucket min price, then running min over strictly-smaller buckets
    # (a handful of rows — windowed on the driver-sized agg, broadcast back)
    bmins = (
        part.withColumn("__b", bucket)
        .groupBy("__b")
        .agg(F.min("p_retailprice").alias("__bmin"))
    )
    w_prefix = (
        Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = bmins.select(
        "__b", F.min("__bmin").over(w_prefix).alias("__prefix_min")
    )
    return (
        part.withColumn("__b", bucket)
        .join(F.broadcast(prefix), "__b")
        .withColumn("__min_local", F.min("p_retailprice").over(w_lt_local))
        .withColumn("__min_lt", F.least("__min_local", "__prefix_min"))
        .withColumn("__min_eq", F.min("p_retailprice").over(w_eq))
        .filter(
            (F.col("__min_lt").isNull() | (F.col("__min_lt") > F.col("p_retailprice")))
            & (F.col("__min_eq") >= F.col("p_retailprice"))
        )
        .select(
            "p_partkey", "p_size", F.round("p_retailprice", 2).alias("p_retailprice")
        )
    )


@register(
    "q_funnel",
    oracle=f"""
{E_CTE},
s1 AS (SELECT user_id, MIN(ts) AS t1 FROM e
       WHERE event_type = 'view' GROUP BY user_id),
s2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM e JOIN s1 USING (user_id)
       WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id),
s3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM e JOIN s2 USING (user_id)
       WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id)
SELECT CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n_view,
       CAST((SELECT COUNT(*) FROM s2) AS BIGINT) AS n_view_click,
       CAST((SELECT COUNT(*) FROM s3) AS BIGINT) AS n_view_click_purchase
""",
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users who viewed, then clicked AFTER the first
    view, then purchased AFTER that click — strict event-order funnel,
    not mere set intersection. Three conditional-min aggregations, each
    joined back on user_id; all three shuffles share the user_id key so
    the exchange is reused. At 100 TB the per-stage state is one row per
    user (bounded), never the raw event log."""
    events = load_table(spark, sf_dir, "events")
    s1 = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        events.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        events.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        s1.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(s2.agg(F.count(F.lit(1)).alias("n_view_click")))
        .crossJoin(
            s3.agg(F.count(F.lit(1)).alias("n_view_click_purchase"))
        )
    )


@register(
    "q_retention",
    oracle=f"""
{E_CTE},
first AS (SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
          FROM e GROUP BY user_id),
active AS (SELECT DISTINCT e.user_id, date_trunc('week', e.ts) AS week
           FROM e)
SELECT CAST(f.cohort_week AS TIMESTAMP) AS cohort_week,
       CAST(date_diff('week', f.cohort_week, a.week) AS BIGINT)
         AS week_offset,
       CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
FROM first f JOIN active a USING (user_id)
GROUP BY f.cohort_week, date_diff('week', f.cohort_week, a.week)
""",
)
def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity week, counted
    in each subsequent active week (offset in whole weeks). The
    first-touch aggregate and the distinct-activity set both hash on
    user_id — one co-located join, then a small (cohort, offset) agg.
    date_trunc('week') is Monday-anchored in both engines; the offset is
    an exact integer division of day differences (no tz involved:
    timestamps are ntz)."""
    events = load_table(spark, sf_dir, "events")

    # Monday-anchored week start in the DATE domain: date_trunc('week')
    # on a timestamp_ntz returns a session-TZ timestamp that shifts on
    # a non-UTC driver host (found by the TZ=America/New_York probe);
    # dayofweek arithmetic is wall-clock on any host. Sunday=1..Sat=7,
    # so (dow+5)%7 is days-since-Monday.
    def monday(ts):
        d = ts.cast("date")
        return F.date_sub(d, (F.dayofweek(d) + 5) % 7)

    first = events.groupBy("user_id").agg(
        monday(F.min("ts")).alias("cohort_day")
    )
    active = events.select(
        "user_id", monday(F.col("ts")).alias("week")
    ).distinct()
    joined = first.join(active, "user_id")
    return (
        joined.withColumn(
            "week_offset",
            (F.datediff(F.col("week"), F.col("cohort_day")) / 7).cast("long"),
        )
        .groupBy(
            F.col("cohort_day").cast("timestamp_ntz").alias("cohort_week"),
            "week_offset",
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


@register(
    "q_agg_weighted_median",
    oracle="""
WITH ordered AS (
  SELECT l_returnflag, l_discount, l_quantity,
         SUM(l_quantity) OVER (
           PARTITION BY l_returnflag
           ORDER BY l_discount, l_orderkey, l_linenumber
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_w,
         SUM(l_quantity) OVER (PARTITION BY l_returnflag) AS tot_w
  FROM lineitem)
SELECT l_returnflag, MIN(l_discount) AS weighted_median_discount
FROM ordered WHERE cum_w >= tot_w / 2
GROUP BY l_returnflag
""",
)
def q_agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median of l_discount weighted by l_quantity, per return
    flag: first value whose running weight reaches half the total.
    ROWS frame with a unique (orderkey, linenumber) tiebreak fixes the
    accumulation order; quantities are integer-valued doubles so every
    cumulative sum is EXACT (< 2^53) — the >= tot/2 comparison cannot
    straddle engine float noise. One sort per group, no second pass:
    the total rides the same window partition."""
    li = load_table(spark, sf_dir, "lineitem")
    w_cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_discount", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("l_returnflag")
    return (
        li.withColumn("cum_w", F.sum("l_quantity").over(w_cum))
        .withColumn("tot_w", F.sum("l_quantity").over(w_tot))
        .filter(F.col("cum_w") >= F.col("tot_w") / 2)
        .groupBy("l_returnflag")
        .agg(F.min("l_discount").alias("weighted_median_discount"))
    )
