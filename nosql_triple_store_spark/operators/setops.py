"""Set-algebra operators (SURVEY §2.C q_union_except_intersect; reference
analog: dict union R8, MasterServer.py:106-115 — generalized to real
UNION/INTERSECT/EXCEPT semantics).

Scale note: Spark plans distinct set ops as hash aggregations on the key —
one shuffle each; EXCEPT/INTERSECT become left-anti/left-semi joins after
de-dup, both broadcast-able when one side is small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_SETOP_ORACLE = """
WITH a AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
b AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders
      WHERE o_totalprice > 100000)
SELECT 'union' AS op, c_custkey FROM (SELECT * FROM a UNION SELECT * FROM b)
UNION ALL
SELECT 'intersect', c_custkey FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
UNION ALL
SELECT 'except', c_custkey FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
"""


@register("q_union_except_intersect", oracle=_SETOP_ORACLE)
def q_union_except_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT (distinct semantics) over two customer-key
    sets, tagged into one result so all three ops are oracle-checked."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = (
        orders.filter(F.col("o_totalprice") > 100000)
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    tagged = (
        a.union(b).distinct().select(F.lit("union").alias("op"), "c_custkey")
        .unionByName(
            a.intersect(b).select(F.lit("intersect").alias("op"), "c_custkey")
        )
        .unionByName(
            a.subtract(b).select(F.lit("except").alias("op"), "c_custkey")
        )
    )
    return tagged
