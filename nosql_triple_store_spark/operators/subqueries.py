"""Subquery surface: correlated scalar / IN / NOT IN via spark.sql —
exercising Catalyst's subquery decorrelation (rewrites to joins; the
reference has no query language at all, SURVEY §2.B). Plus the TPC-H Q3
composite shape as a recognizable headline workload."""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401 (parity with siblings)

from ..catalog import load_table
from ..registry import register


def _view(df: DataFrame, prefix: str) -> str:
    name = f"{prefix}_{uuid.uuid4().hex[:8]}"
    df.createOrReplaceTempView(name)
    return name


@register(
    "q_subquery_scalar",
    oracle="""
SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
FROM orders o
WHERE o.o_totalprice > 1.5 * (
  SELECT AVG(o2.o_totalprice) FROM orders o2
  WHERE o2.o_custkey = o.o_custkey)
""",
)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: orders 1.5x above their own customer's
    average. Catalyst decorrelates to an aggregate + join — one shuffle on
    the correlation key instead of a per-row subquery execution."""
    v = _view(load_table(spark, sf_dir, "orders"), "orders_sq")
    return spark.sql(
        f"""
SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
FROM {v} o
WHERE o.o_totalprice > 1.5 * (
  SELECT AVG(o2.o_totalprice) FROM {v} o2
  WHERE o2.o_custkey = o.o_custkey)
"""
    )


@register(
    "q_subquery_in",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders
                    WHERE o_totalprice > 300000)
  AND c_custkey NOT IN (SELECT o_custkey FROM orders
                        WHERE o_orderstatus = 'F'
                          AND o_totalprice > 400000)
""",
)
def q_subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN + NOT IN subqueries (decorrelate to semi/anti joins; the keys
    are non-null so NOT IN's three-valued-logic trap stays defused)."""
    vc = _view(load_table(spark, sf_dir, "customer"), "cust_sq")
    vo = _view(load_table(spark, sf_dir, "orders"), "orders_sq2")
    return spark.sql(
        f"""
SELECT c_custkey, c_name
FROM {vc}
WHERE c_custkey IN (SELECT o_custkey FROM {vo}
                    WHERE o_totalprice > 300000)
  AND c_custkey NOT IN (SELECT o_custkey FROM {vo}
                        WHERE o_orderstatus = 'F'
                          AND o_totalprice > 400000)
"""
    )


@register(
    "q_tpch_q3",
    oracle="""
SELECT l.l_orderkey,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1997-03-15'
  AND l.l_shipdate > TIMESTAMP '1997-03-15'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
""",
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority) adapted to the fixture schema:
    segment-filtered 3-way join, revenue aggregate, top-10. Ordering is
    on the ROUNDED revenue with date+orderkey tiebreaks so float ulps
    can't flip ranks cross-engine."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-03-15").cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-03-15").cast("timestamp_ntz")
    )
    j = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
    )
    agg = j.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue")
    )
    return (
        agg.orderBy(
            F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey")
        )
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )
