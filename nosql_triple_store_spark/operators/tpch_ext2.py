"""TPC-H shapes, second batch: Q6 (forecast revenue change), Q12
(shipping-priority counts, adapted to the fixture's columns), Q14 (promo
revenue share), Q19 (disjunctive predicate revenue, adapted).

Q6/Q19 are the pushdown showcases: every predicate is scan-evaluable, so
the plans are a single scan + partial/final agg with NO join and NO wide
shuffle — `.explain` shows the filters inside the parquet scan
(PushedFilters) and whole-stage codegen end-to-end."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_tpch_q6",
    oracle="""
SELECT ROUND(SUM(l_extendedprice * l_discount), 1) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: single-scan filtered aggregate — all four predicates
    push to the parquet scan, the sum is partial-aggregable, no shuffle
    beyond the final 1-row combine. Revenue rounds at 1dp (price x
    discount products are boundary-dense at 2dp, cf. q_tpch_q10).
    BETWEEN on l_discount compares raw stored doubles — the fixture's
    discounts are exact parquet values, identical bits in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")), 1
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "q_tpch_q12",
    oracle="""
SELECT l.l_returnflag,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l.l_returnflag
""",
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (the fixture has no l_shipmode, so the grouping
    key is l_returnflag; the priority-class conditional counts are
    verbatim): one fact-fact join on orderkey + conditional aggregation
    — both partial-aggregable, one shuffle each."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@register(
    "q_tpch_q14",
    oracle="""
SELECT ROUND(
         100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                          THEN l.l_extendedprice * (1 - l.l_discount)
                          ELSE 0 END)
         / SUM(l.l_extendedprice * (1 - l.l_discount)), 4)
       AS promo_revenue_pct
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
  AND l.l_shipdate < TIMESTAMP '1996-04-01'
""",
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promo revenue share): conditional-sum ratio over one
    month. Both sums accumulate in the SAME partial-agg pass (one
    shuffle); the ratio of two identically-computed doubles is
    bit-identical cross-engine before the single final rounding."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "q_tpch_q19",
    oracle="""
SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 1) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 21)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 30
       AND l.l_quantity BETWEEN 10 AND 30)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 45
       AND l.l_quantity BETWEEN 20 AND 40)
""",
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue under a 3-branch disjunctive
    brand/size/quantity predicate; the fixture has no p_container so
    that conjunct is omitted). Catalyst extracts the common
    sub-predicates, pushes the part-side disjunction (brand, size) into
    the part scan, the lineitem-side (quantity) into the lineitem scan,
    and evaluates the cross-side residual on the joined rows — the OR
    does NOT defeat pushdown."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(part, li.l_partkey == part.p_partkey)
    branch = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    return (
        j.filter(
            branch("Brand#12", 15, 1, 21)
            | branch("Brand#23", 30, 10, 30)
            | branch("Brand#34", 45, 20, 40)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 1
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
