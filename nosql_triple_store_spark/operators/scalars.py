"""Scalar-function queries: string / datetime / math / JSON expression
coverage (SURVEY §2.C; the reference's only scalar work is strptime
timestamp formatting, SQLite3DBConnector.py:74,166 — §2.B).

All expressions are built-in pyspark.sql.functions (JVM-side, inside
whole-stage codegen); no Python UDFs anywhere in the hot path. Cross-engine
trap notes: day-of-week numbering differs (Spark dayofweek=1..7 Sun-first,
DuckDB dayofweek=0..6) — we standardize on ISO weekday (1=Monday..7) via
Spark weekday()+1 == DuckDB isodow().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_scalar_string",
    oracle="""
SELECT p_brand,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(CASE WHEN p_name LIKE '%a%' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_with_a,
       MIN(UPPER(SUBSTRING(p_name, 1, 12))) AS first_name_up,
       MAX(p_brand || '/' || p_type) AS max_brand_type
FROM part GROUP BY p_brand
""",
)
def q_scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/substring/concat/like over part names, aggregated per brand."""
    part = load_table(spark, sf_dir, "part")
    return part.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum(F.when(F.col("p_name").like("%a%"), 1).otherwise(0)).alias(
            "n_with_a"
        ),
        F.min(F.upper(F.substring("p_name", 1, 12))).alias("first_name_up"),
        F.max(F.concat_ws("/", "p_brand", "p_type")).alias("max_brand_type"),
    )


@register(
    "q_scalar_datetime",
    oracle="""
SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
       EXTRACT(MONTH FROM o_orderdate) AS o_month,
       CAST(isodow(o_orderdate) AS INT) AS iso_dow,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total_price
FROM orders GROUP BY 1, 2, 3
""",
)
def q_scalar_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/ISO-weekday buckets of o_orderdate."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            F.month("o_orderdate").cast("long").alias("o_month"),
            (F.weekday("o_orderdate") + 1).alias("iso_dow"),
            "o_totalprice",
        )
        .groupBy("o_year", "o_month", "iso_dow")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


@register(
    "q_scalar_math",
    oracle="""
SELECT l_returnflag,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
         AS total_charge,
       ROUND(AVG(SQRT(l_quantity)), 4) AS avg_sqrt_qty,
       CAST(MAX(CEIL(l_extendedprice)) AS BIGINT) AS max_ceil_price,
       CAST(MIN(FLOOR(l_extendedprice)) AS BIGINT) AS min_floor_price,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem GROUP BY l_returnflag
""",
)
def q_scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic / round / sqrt / ceil / floor over lineitem pricing."""
    li = load_table(spark, sf_dir, "lineitem")
    # NOTE: no per-row round before the sum — Spark's ROUND(double) goes
    # through BigDecimal on the shortest decimal repr while DuckDB scales
    # the raw binary double, so half-way cases disagree row-by-row; a
    # single round at the aggregate masks both engines' accumulation noise.
    charge = (
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    )
    return li.groupBy("l_returnflag").agg(
        F.round(F.sum(charge), 2).alias("total_charge"),
        F.round(F.avg(F.sqrt("l_quantity")), 4).alias("avg_sqrt_qty"),
        F.max(F.ceil("l_extendedprice")).alias("max_ceil_price"),
        F.min(F.floor("l_extendedprice")).alias("min_floor_price"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q_json_extract",
    oracle="""
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 2) AS total_value
FROM events GROUP BY 1
""",
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extract a field from the events.props JSON string and aggregate by
    it (multimodal/typed-metadata pattern: JSON stays a string column,
    extraction is a codegen'd path expression, no UDF)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.select(
            F.get_json_object("props", "$.k").cast("long").alias("k"), "value"
        )
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
