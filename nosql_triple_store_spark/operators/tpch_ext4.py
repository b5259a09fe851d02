"""TPC-H shapes, fourth batch — completing all 22 structural signatures:
Q2 (min-cost supplier / correlated argmin), Q9 (product profit), Q11
(important stock / HAVING over a global scalar), Q16 (supplier count
with NOT IN exclusion), Q20 (nested-IN supplier selection), Q21
(multi-EXISTS waiting-supplier).

The fixture has no partsupp, so cost/stock are derived from lineitem:
each adaptation is chosen to preserve the query's SIGNATURE — the
correlated argmin, the profit expression over a part join, the
HAVING-vs-global-total, the NOT IN decorrelation, the IN-chain
semi-joins, and Q21's exists/not-exists pair over the same fact table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from ..materialize import materialize


@register(
    "q_tpch_q2",
    oracle="""
WITH sp AS (
  SELECT DISTINCT l.l_partkey AS partkey, l.l_suppkey AS suppkey
  FROM lineitem l),
ranked AS (
  SELECT sp.partkey, sp.suppkey, s.s_name, s.s_acctbal,
         row_number() OVER (PARTITION BY sp.partkey
                            ORDER BY s.s_acctbal, sp.suppkey) AS rn
  FROM sp JOIN supplier s ON s.s_suppkey = sp.suppkey)
SELECT p.p_partkey, p.p_name, ROUND(p.p_retailprice, 2) AS p_retailprice,
       r.s_name, ROUND(r.s_acctbal, 2) AS s_acctbal
FROM part p JOIN ranked r ON r.partkey = p.p_partkey AND r.rn = 1
WHERE p.p_size BETWEEN 10 AND 15
ORDER BY p.p_retailprice DESC, p.p_partkey
LIMIT 20
""",
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier; supply cost becomes the
    supplier's account balance, the supplier-part relation comes from
    observed lineitems): per part, the argmin supplier by (acctbal,
    suppkey) — min_by over a struct instead of the oracle's
    row_number=1, the partial-aggregable form of the correlated min.
    Top-20 parts by retail price with deterministic tiebreaks."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_size").between(10, 15)
    )
    sp = li.select(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).distinct()
    joined = sp.join(s, sp.suppkey == s.s_suppkey)
    best = joined.groupBy("partkey").agg(
        F.min_by(
            F.struct("s_name", "s_acctbal"),
            F.struct("s_acctbal", "suppkey"),
        ).alias("__b")
    )
    return (
        p.join(best, p.p_partkey == best.partkey)
        .select(
            "p_partkey",
            "p_name",
            F.round("p_retailprice", 2).alias("p_retailprice"),
            F.col("__b.s_name").alias("s_name"),
            F.round(F.col("__b.s_acctbal"), 2).alias("s_acctbal"),
        )
        .orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
        .limit(20)
    )


@register(
    "q_tpch_q9",
    oracle="""
SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)
                 - l.l_quantity * p.p_retailprice * 0.1), 1) AS profit
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE p.p_name LIKE '%gear%'
GROUP BY 1, 2
""",
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit; supply cost becomes 10% of the
    part's retail price per unit): revenue minus cost per supplier
    nation and order year over name-matched parts — the five-way join
    with an arithmetic profit expression, aggregated partial-first.
    nation broadcasts; profit rounds once at 1dp (multiplied doubles
    are 2dp-boundary-dense)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("l_quantity") * F.col("p_retailprice") * 0.1
    )
    j = (
        li.join(p, p.p_partkey == li.l_partkey)
        .join(s, s.s_suppkey == li.l_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, o.o_orderkey == li.l_orderkey)
    )
    return j.groupBy(
        F.col("n_name").alias("nation"),
        F.year("o_orderdate").cast("long").alias("o_year"),
    ).agg(F.round(F.sum(profit), 1).alias("profit"))


@register(
    "q_tpch_q11",
    oracle="""
WITH inv AS (
  SELECT l.l_partkey AS partkey,
         SUM(l.l_quantity * l.l_extendedprice) AS value
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'ASIA'
  GROUP BY l.l_partkey),
st AS (SELECT SUM(value) AS t, COUNT(*) AS np FROM inv)
SELECT partkey, ROUND(value, 2) AS value
FROM inv, st
WHERE value > 2.0 * st.t / st.np
""",
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock; stock value becomes quantity x price
    over ASIA-region suppliers' shipped lineitems — single nations are
    not guaranteed suppliers at sf0.001, regions are): per-part value
    above TWICE the average part value — the HAVING-over-global-scalar
    signature, made scale-invariant (a fixed fraction like Q11's
    0.0001/SF empties or floods as part count scales). The global
    scalar sums floats in engine-specific order; threshold margins
    probed at 94070/18281/239 per tier vs accumulation noise ~1e-5.
    Value rounds once at 2dp: integer qty x 2dp price products are
    CLEAN 2-decimal addends, so the exact sum lies ON the 2dp grid
    (0.005 from any 2dp boundary) and EXACTLY ON 1dp half-way
    boundaries — 1dp flipped at sf0.1, found live."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nr = F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey))
    inv = (
        li.join(s, s.s_suppkey == li.l_suppkey)
        .join(nr, s.s_nationkey == nr.n_nationkey)
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(F.col("l_quantity") * F.col("l_extendedprice")).alias("value"))
        .transform(materialize)
    )
    st = inv.agg(F.sum("value").alias("t"), F.count(F.lit(1)).alias("np"))
    return (
        inv.crossJoin(F.broadcast(st))
        .filter(F.col("value") > 2.0 * F.col("t") / F.col("np"))
        .select("partkey", F.round("value", 2).alias("value"))
    )


@register(
    "q_tpch_q16",
    oracle="""
SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
       CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#12' AND p.p_size IN (5, 10, 15, 20)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                          WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
""",
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (supplier count by part attributes; the complaint-
    comment exclusion becomes negative-balance suppliers): NOT IN over
    a non-null key set decorrelates to a left-anti join, then a
    distinct count per (brand, type, size). The exclusion set is tiny
    and broadcasts."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#12")
        & F.col("p_size").isin(5, 10, 15, 20)
    )
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select(F.col("s_suppkey").alias("l_suppkey"))
    return (
        li.join(p, p.p_partkey == li.l_partkey)
        .join(F.broadcast(bad), "l_suppkey", "left_anti")
        .groupBy("p_brand", "p_type", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q_tpch_q20",
    oracle="""
WITH promo_parts AS (
  SELECT p_partkey FROM part WHERE p_type = 'PROMO'),
heavy AS (
  SELECT l_suppkey, l_partkey
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1997-01-01'
    AND l_partkey IN (SELECT p_partkey FROM promo_parts)
  GROUP BY l_suppkey, l_partkey
  HAVING SUM(l_quantity) > 45)
SELECT s.s_suppkey, s.s_name
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND s.s_suppkey IN (SELECT l_suppkey FROM heavy)
""",
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (excess-stock suppliers; availqty>half-shipped becomes
    shipped-quantity>45 of a PROMO part in 1996, suppliers scoped to
    the ASIA region — thresholds probed non-vacuous at every tier,
    1/15/158 rows): the nested IN chain — parts IN promo, (supplier,
    part) aggregate HAVING, supplier IN heavy — each level a semi
    join; quantities are integer-valued so the HAVING threshold is
    exact."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    heavy = (
        li.join(
            part.select(F.col("p_partkey").alias("l_partkey")),
            "l_partkey",
            "left_semi",
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 45)
        .select("l_suppkey")
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nr = F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey))
    return (
        s.join(nr, s.s_nationkey == nr.n_nationkey)
        .join(
            heavy.select(F.col("l_suppkey").alias("s_suppkey")),
            "s_suppkey",
            "left_semi",
        )
        .select("s_suppkey", "s_name")
    )


@register(
    "q_tpch_q21",
    oracle="""
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE o.o_orderstatus = 'F' AND n.n_name = 'NATION_3'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 20
""",
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting): the sole late
    supplier in a multi-supplier finished order. The oracle keeps the
    textbook EXISTS / NOT EXISTS pair; the engine computes the same
    predicate as per-order AGGREGATES — distinct suppliers >= 2 and
    exactly one late supplier — turning two correlated subqueries into
    one groupBy over the order's lines (the decorrelated,
    partial-aggregable form; one shuffle on orderkey instead of two
    repeated self-joins)."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_3"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    li = load_table(spark, sf_dir, "lineitem")
    lo = li.join(
        o.select("o_orderkey", "o_orderdate"),
        li.l_orderkey == F.col("o_orderkey"),
    ).withColumn(
        "is_late",
        (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")
        ).cast("int"),
    )
    per_order = lo.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(
            F.when(F.col("is_late") == 1, F.col("l_suppkey"))
        ).alias("n_late_supp"),
    )
    qualifying = per_order.filter(
        (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)
    ).select("l_orderkey")
    late_lines = (
        lo.filter(F.col("is_late") == 1)
        .join(qualifying, "l_orderkey", "left_semi")
    )
    return (
        late_lines.join(s, late_lines.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )
