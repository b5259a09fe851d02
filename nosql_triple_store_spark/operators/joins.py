"""Relational join operators (SURVEY §2.C "north star" rows).

The reference has no joins at all (SURVEY §2.B); these generalize its
key-routed lookups into the full join family a user of the engine needs.

Scale notes baked into each plan:
- dims (region/nation) are broadcast explicitly; customer-sized sides are
  left to AQE's dynamic broadcast/sort-merge selection.
- non-equi (theta) joins aggregate before returning to keep result sets
  bounded; the join itself runs as broadcast-nested-loop on the small side.
- the as-of join is equi-key + range predicate, then a max_by per probe row
  — one shuffle, partial-aggregable, with AQE skew splitting for hot keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .triple import E_CTE


@register(
    "q_join_broadcast",
    oracle="SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment "
    "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey",
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join with an explicit broadcast hint on the dimension side:
    no shuffle of the fact table, hash lookup inside the scan stage."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    return orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey, "inner"
    ).select("o_orderkey", "o_totalprice", "c_name", "c_mktsegment")


@register(
    "q_join_multiway",
    oracle="""
SELECT r.r_name, n.n_name,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lineitems
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
""",
)
def q_join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema 5-way join -> revenue per (region, nation).

    lineitem⋈orders is the only big-big join (sort-merge, AQE-planned);
    nation/region broadcast. Revenue aggregates partially map-side after
    the final shuffle keys collapse to (r_name, n_name).
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return joined.groupBy("r_name", "n_name").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_lineitems"),
    )


@register(
    "q_join_semi",
    oracle="SELECT c_custkey, c_name FROM customer c "
    "WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)",
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers with ≥1 order. Semi joins ship only the
    join key of the probe side and stop at first match — cheaper than
    join+distinct at any scale."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "q_join_anti",
    oracle="SELECT c_custkey, c_name FROM customer c "
    "WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)",
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no orders (the NOT EXISTS dual)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "q_join_theta",
    oracle="""
SELECT a.p_brand,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(AVG(CAST(b.p_size - a.p_size AS DOUBLE)), 2) AS avg_size_gap
FROM part a JOIN part b
  ON a.p_brand = b.p_brand AND a.p_size < b.p_size
GROUP BY a.p_brand
""",
)
def q_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta (non-equi) self-join: same-brand part pairs with increasing
    size, as aggregates. The brand key has FIXED cardinality, so
    enumerating row pairs is inherently quadratic in rows (the r7 sf1
    sweep measured 230 s at 200k parts); instead the pairs exist only
    virtually: pre-aggregate to per-(brand, size) counts (linear,
    partial-aggregable), then combine count cells pairwise —
    |brands| x |sizes|^2 cells, n-independent. n_pairs = sum(c_a*c_b)
    and the gap average weights each (a_size, b_size) cell by its pair
    multiplicity; both are exact integers in double, so the division
    matches the oracle's pair-enumerating AVG bit-for-bit."""
    part = load_table(spark, sf_dir, "part")
    g = part.groupBy("p_brand", "p_size").agg(
        F.count(F.lit(1)).alias("c")
    )
    a = g.select(
        "p_brand",
        F.col("p_size").alias("a_size"),
        F.col("c").alias("ca"),
    )
    b = g.select(
        F.col("p_brand").alias("b_brand"),
        F.col("p_size").alias("b_size"),
        F.col("c").alias("cb"),
    )
    pairs = a.join(
        b, (a.p_brand == b.b_brand) & (a.a_size < b.b_size), "inner"
    )
    mult = F.col("ca") * F.col("cb")
    return pairs.groupBy("p_brand").agg(
        F.sum(mult).alias("n_pairs"),
        F.round(
            F.sum(
                mult.cast("double")
                * (F.col("b_size") - F.col("a_size")).cast("double")
            )
            / F.sum(mult.cast("double")),
            2,
        ).alias("avg_size_gap"),
    )


_ASOF_ORACLE = f"""
{E_CTE},
j AS (
  SELECT e.event_id, e.user_id, e.ts, o.o_orderkey,
         CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate,
         row_number() OVER (PARTITION BY e.event_id
                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC)
           AS rn
  FROM e LEFT JOIN orders o
    ON o.o_custkey = e.user_id AND CAST(o.o_orderdate AS TIMESTAMP) <= e.ts)
SELECT event_id, user_id, ts, o_orderkey, o_orderdate FROM j WHERE rn = 1
"""


@register("q_join_asof", oracle=_ASOF_ORACLE)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event matched to the latest order at-or-before its
    timestamp for the same key (user_id = o_custkey).

    Spark lacks a native as-of join; this is equi-key join + range filter +
    max_by per probe row — one shuffle on the key, partial-aggregable.
    Ties broken by o_orderkey for hash-stable output. For very dense match
    sets, the scale path is a bucketed sort-merge + mapInPandas
    merge_asof per key bucket; not needed while matches/key stay modest.
    """
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    j = events.join(
        orders,
        (orders.o_custkey == events.user_id) & (orders.o_orderdate <= events.ts),
        "left",
    )
    picked = j.groupBy("event_id", "user_id", "ts").agg(
        F.max_by(
            F.struct("o_orderkey", "o_orderdate"),
            F.struct("o_orderdate", "o_orderkey"),
        ).alias("__m")
    )
    return picked.select(
        "event_id",
        "user_id",
        "ts",
        F.col("__m.o_orderkey").alias("o_orderkey"),
        F.col("__m.o_orderdate").alias("o_orderdate"),
    )
