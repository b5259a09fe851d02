"""Aggregation operators: hash agg, distinct, approximate, and
grouping-set families (SURVEY §2.C; absent from the reference, §2.B).

Every aggregate here is associative → Spark plans partial (map-side) +
final aggregation around one shuffle on the group keys; rollup/cube expand
to grouping-set unions that share the same shuffled child. Float-producing
aggregates round (2 dp) for hash-stable cross-engine comparison
(SURVEY §7.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_agg_pricing",
    oracle="""
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(AVG(l_quantity), 4) AS avg_qty,
       ROUND(AVG(l_discount), 4) AS avg_disc,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def q_agg_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the canonical scan→filter→hash-agg pipeline.
    Whole-stage-codegen'd partial agg over the pushed-down shipdate filter;
    only |flags|×|statuses| rows cross the shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q_agg_distinct",
    oracle="SELECT c.c_mktsegment, "
    "CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_customers, "
    "CAST(COUNT(*) AS BIGINT) AS n_orders "
    "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
    "GROUP BY c.c_mktsegment",
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct per group. Spark plans count(distinct) as a two-phase
    expand+agg so the distinct de-dup happens pre-shuffle per key."""
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register("q_agg_approx_distinct", oracle=None)  # rows-only: HLL values differ
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++): the sketch merge is
    order-insensitive, so results are deterministic for fixed data — but
    sketch values differ from DuckDB's HLL, hence rows-only. At 100 TB this
    replaces exact distinct wherever ±2% error is acceptable: no expand,
    constant memory per group."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "q_rollup",
    oracle="""
SELECT COALESCE(r_name, 'ALL') AS r_name_g, COALESCE(n_name, 'ALL') AS n_name_g,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       ROUND(SUM(c_acctbal), 2) AS total_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP(r_name, n_name)
""",
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP(region, nation): hierarchical subtotals + grand total.
    'ALL' sentinel replaces grouping NULLs (group keys are never null in
    the data, so the sentinel is unambiguous)."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    j = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return (
        j.rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("r_name_g"),
            F.coalesce("n_name", F.lit("ALL")).alias("n_name_g"),
            "n_customers",
            "total_acctbal",
        )
    )


@register(
    "q_cube",
    oracle="""
SELECT COALESCE(o_orderstatus, 'ALL') AS status_g,
       COALESCE(o_orderpriority, 'ALL') AS priority_g,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total_price
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
""",
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE(status, priority): all 2^2 grouping combinations in one pass
    over a single shuffle (Expand operator duplicates rows per set)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status_g"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority_g"),
            "n_orders",
            "total_price",
        )
    )


@register(
    "q_grouping_sets",
    oracle="""
WITH e AS (SELECT user_id, event_type, value FROM events)
SELECT COALESCE(event_type, 'ALL') AS event_type_g,
       COALESCE(CAST(user_id AS VARCHAR), 'ALL') AS user_id_g,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 2) AS total_value
FROM e
GROUP BY GROUPING SETS ((event_type), (user_id), ())
""",
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS: per-type totals, per-user totals, and grand
    total in one shuffle (vs three separate scans+aggs)."""
    events = load_table(spark, sf_dir, "events")
    events.createOrReplaceTempView("events_gs_v")
    return spark.sql(
        """
SELECT COALESCE(event_type, 'ALL') AS event_type_g,
       COALESCE(CAST(user_id AS STRING), 'ALL') AS user_id_g,
       COUNT(1) AS n_events,
       ROUND(SUM(value), 2) AS total_value
FROM events_gs_v
GROUP BY GROUPING SETS ((event_type), (user_id), ())
"""
    )
