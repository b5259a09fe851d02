"""Sixteenth extension batch: VARIANT semi-structured access, error-safe
try_* arithmetic, correlated LATERAL subquery.

Lineage: the Spark 4 surfaces a migrating user needs — VARIANT is the
typed semi-structured path beyond get_json_object strings
(q_json_extract/q_json_nested), try_* is the ANSI-mode-safe arithmetic
family (Spark 4 runs ANSI by default: silent-null arithmetic became
errors, and try_* is the opt-back-in), LATERAL is the correlated
top-N-per-group SQL shape (same semantics as q_window_rank's window,
different plan: decorrelated join instead of a global partition sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .triple import E_CTE

_VARIANT_ORACLE = f"""
{E_CTE},
x AS (
  SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, value
  FROM e)
SELECT k // 10 AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(k) AS BIGINT) AS k_min,
       CAST(MAX(k) AS BIGINT) AS k_max,
       ROUND(SUM(value), 2) AS total_value
FROM x GROUP BY k // 10
"""


@register("q_json_variant", oracle=_VARIANT_ORACLE)
def q_json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access via the VARIANT type (Spark 4):
    parse_json once into a binary variant, then typed variant_get
    extraction — at 100 TB this beats per-expression get_json_object
    (q_json_extract), which re-parses the JSON string for every path it
    pulls; a variant parses once and serves all paths, and columnar
    shredding can push extraction to the scan. Decile rollup over the
    extracted key proves typed extraction end-to-end. A unit test pins
    schema_of_variant_agg to the expected object shape."""
    ev = load_table(spark, sf_dir, "events")
    x = ev.select(
        F.variant_get(F.parse_json("props"), "$.k", "bigint").alias("k"),
        "value",
    )
    return x.groupBy((F.col("k") / 10).cast("long").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("k").alias("k_min"),
        F.max("k").alias("k_max"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


_TRY_ORACLE = f"""
{E_CTE},
x AS (
  SELECT value,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM e),
y AS (
  SELECT value / NULLIF(k, 0) AS ratio,
         TRY_CAST('2024-01-' || lpad(CAST(k % 40 + 1 AS VARCHAR), 2, '0')
                  AS DATE) AS d
  FROM x)
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(*) - COUNT(ratio) AS BIGINT) AS n_div_by_zero,
       CAST(SUM(CAST(FLOOR(ratio) AS BIGINT)) AS BIGINT) AS sum_floor_ratio,
       CAST(COUNT(d) AS BIGINT) AS n_valid_dates,
       CAST(COUNT(*) - COUNT(d) AS BIGINT) AS n_invalid_dates
FROM y
"""


@register("q_scalar_try", oracle=_TRY_ORACLE)
def q_scalar_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe scalar surface under ANSI mode: try_divide yields NULL
    on the fixture's real k=0 rows (where ANSI `/` would abort the whole
    100 TB job on one bad row), try_to_date yields NULL for synthesized
    impossible dates (day 32-40). Null-skipping aggregates then count
    failures explicitly — the quarantine-and-count pattern for dirty
    data. Determinism: the only float op is ONE division of the same
    two numbers in both engines (bit-identical), floored to exact ints
    before summing."""
    ev = load_table(spark, sf_dir, "events")
    x = ev.select(
        "value",
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
    )
    y = x.select(
        F.try_divide("value", "k").alias("ratio"),
        F.try_to_date(
            F.concat(
                F.lit("2024-01-"),
                F.lpad((F.col("k") % 40 + 1).cast("string"), 2, "0"),
            )
        ).alias("d"),
    )
    return y.agg(
        F.count(F.lit(1)).alias("n"),
        (F.count(F.lit(1)) - F.count("ratio")).alias("n_div_by_zero"),
        F.sum(F.floor("ratio").cast("bigint")).alias("sum_floor_ratio"),
        F.count("d").alias("n_valid_dates"),
        (F.count(F.lit(1)) - F.count("d")).alias("n_invalid_dates"),
    )


_LATERAL_SQL = """
SELECT n.n_name, t.o_orderkey, t.o_totalprice
FROM {n} n, LATERAL (
  SELECT o_orderkey, o_totalprice
  FROM {o} JOIN {c} ON o_custkey = c_custkey
  WHERE c_nationkey = n.n_nationkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 2) t
"""

_LATERAL_ORACLE = """
SELECT n.n_name, t.o_orderkey, t.o_totalprice
FROM nation n, LATERAL (
  SELECT o_orderkey, o_totalprice
  FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE c_nationkey = n.n_nationkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 2) t
"""


@register("q_join_lateral_topk", oracle=_LATERAL_ORACLE)
def q_join_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: the 2 highest-value orders per
    nation, written as the SQL-standard lateral top-N instead of a
    window. Catalyst DECORRELATES it — the per-nation ORDER BY/LIMIT
    becomes a join + per-group limit plan, not 25 separate query
    executions (which is what the reference's per-request routing would
    do, MasterServer.py:292-330). Deterministic via the o_orderkey
    tiebreak; DuckDB runs the identical lateral SQL."""
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return spark.sql(_LATERAL_SQL, n=n, o=o, c=c)
