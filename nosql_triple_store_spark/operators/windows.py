"""Window-function & top-k operators (SURVEY §2.C; absent in reference §2.B).

Determinism rule (SURVEY §7.4): every ordering carries a unique tie-break
column so Spark and DuckDB pick identical rows.

Scale notes: window functions shuffle once on the partition key and sort
within partitions — acceptable when partitions are bounded (per-customer,
per-user). Global top-k deliberately avoids a total sort: Spark plans
orderBy+limit as TakeOrderedAndProject (per-partition heap + driver merge),
which is O(n) shuffle-free at any width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .triple import E_CTE


@register(
    "q_window_rank",
    oracle="""
WITH ranked AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders)
SELECT o_custkey, o_orderkey, o_totalprice, CAST(rnk AS INT) AS rnk
FROM ranked WHERE rnk <= 3
""",
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer. row_number (not rank) + o_orderkey
    tie-break => exactly 3 deterministic rows per customer."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
    )


@register(
    "q_window_running",
    oracle="""
SELECT o_orderkey, o_custkey, CAST(o_orderdate AS TIMESTAMP) AS o_orderdate,
       ROUND(SUM(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
         AS running_total
FROM orders
""",
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running revenue per customer in date order. The explicit ROWS frame
    (not the default RANGE) makes float accumulation order identical in
    both engines, so values match bit-for-bit before rounding."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


_LAG_ORACLE = f"""
{E_CTE},
t AS (SELECT user_id, event_id, ts, epoch_us(ts) AS ts_us FROM e)
SELECT user_id, event_id, ts,
       ts_us - lag(ts_us) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS gap_us
FROM t
"""


@register("q_window_lag", oracle=_LAG_ORACLE)
def q_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event gap in µs via lag(); first event per user gets
    NULL. Integer µs (not float seconds) keeps the comparison exact."""
    events = load_table(spark, sf_dir, "events")
    # load_table pinned the session to UTC, so ntz->timestamp->unix_micros
    # is the exact epoch µs DuckDB's epoch_us(ts) computes.
    t = events.select(
        "user_id",
        "event_id",
        "ts",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return t.select(
        "user_id",
        "event_id",
        "ts",
        (F.col("ts_us") - F.lag("ts_us").over(w)).alias("gap_us"),
    )


@register(
    "q_topk",
    oracle="SELECT o_orderkey, o_custkey, o_totalprice FROM orders "
    "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 by price. Plans as TakeOrderedAndProject: each task
    keeps a 10-row heap, driver merges — no global sort/shuffle, the only
    top-k formulation that survives 100 TB."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )
