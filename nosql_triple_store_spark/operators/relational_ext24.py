"""Twenty-fourth extension batch: relational division and rolling
distinct counts — the last two classic query shapes missing from the
relational surface.

Division ("for all") has no SQL keyword and trips up every code
generator; rolling distinct is the textbook NON-distributive rolling
aggregate (you cannot merge per-window distinct counts), so it gets the
explicit expand-join rewrite."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .triple import E_CTE

_DIVISION_ORACLE = """
WITH n_pri AS (
  SELECT CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS np FROM orders),
per_cust AS (
  SELECT o_custkey,
         CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS npc,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY o_custkey)
SELECT o_custkey, n_orders
FROM per_cust, n_pri
WHERE npc = np
"""


@register("q_join_division", oracle=_DIVISION_ORACLE)
def q_join_division(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational DIVISION ('for all'): customers whose orders span
    EVERY order priority — the universally-quantified join SQL has no
    keyword for. The double-NOT-EXISTS textbook form decorrelates
    terribly; the production rewrite is count-distinct-equals-universe
    (one partial-aggregable groupBy + a 1-row broadcast), which is what
    both engines run here. Probed non-vacuous: some but not all
    customers qualify at every tier (asserted in tests)."""
    orders = load_table(spark, sf_dir, "orders")
    n_pri = orders.agg(
        F.countDistinct("o_orderpriority").alias("np")
    )
    per_cust = orders.groupBy("o_custkey").agg(
        F.countDistinct("o_orderpriority").alias("npc"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return (
        per_cust.crossJoin(F.broadcast(n_pri))
        .filter(F.col("npc") == F.col("np"))
        .select("o_custkey", "n_orders")
    )


_ROLLING_ORACLE = f"""
{E_CTE},
ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM e),
days AS (SELECT DISTINCT day FROM ud),
win AS (
  SELECT d.day, ud.user_id
  FROM days d JOIN ud
    ON ud.day <= d.day AND ud.day >= d.day - INTERVAL 6 DAY)
SELECT day,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
FROM win GROUP BY day
"""


@register("q_window_rolling_distinct", oracle=_ROLLING_ORACLE)
def q_window_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct users per day (WAU) — the canonical
    NON-distributive rolling aggregate: COUNT(DISTINCT) OVER a frame is
    unsupported (per-window counts don't merge), so the rewrite
    materializes (user, day) distinct pairs and band-joins them onto
    the day spine before an exact distinct per day. Shuffle volume is
    |user-days| × 7, bounded by the dedup to one row per user-day first
    (NEVER raw events × 7). At much larger windows the sketch path
    (q_agg_hll_partial: per-day HLL partials, union 7) trades exactness
    for O(|days|) merges — both live in this repo, pick per use case."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    days = ud.select("day").distinct()
    win = days.alias("d").join(
        ud.alias("u"),
        (F.col("u.day") <= F.col("d.day"))
        & (F.col("u.day") >= F.date_sub(F.col("d.day"), 6)),
    )
    return win.groupBy(F.col("d.day").alias("day")).agg(
        F.countDistinct("user_id").alias("wau")
    )
