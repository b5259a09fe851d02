"""Eighteenth extension batch: boolean/filtered aggregates, nth_value
window access, URL parsing, and null-handling scalar combinators — the
remaining everyday-SQL scalar/aggregate surfaces a migrating user
expects (SURVEY §2.B: the reference has no scalar functions at all
beyond timestamp formatting)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .triple import E_CTE

_BOOL_ORACLE = f"""
{E_CTE}
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(*) FILTER (WHERE value > 100) AS BIGINT) AS n_high,
       CAST(bool_and(value < 300) AS BIGINT) AS all_below_300,
       CAST(bool_or(value > 250) AS BIGINT) AS any_above_250
FROM e GROUP BY event_type
"""


@register("q_agg_boolean", oracle=_BOOL_ORACLE)
def q_agg_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate aggregates: count_if (filtered count), bool_and/bool_or
    (universal/existential reductions) per event type — all
    partial-aggregable (AND/OR are associative+commutative, so map-side
    combine applies exactly like sum). Thresholds probed non-vacuous:
    both boolean columns are true for some groups and false for others
    (value spans 0.03-327; 2dp-clean values never sit on the integer
    thresholds). Booleans cast to long so the cross-engine hash sees
    identical integers."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_if(F.col("value") > 100).alias("n_high"),
        F.bool_and(F.col("value") < 300).cast("long").alias("all_below_300"),
        F.bool_or(F.col("value") > 250).cast("long").alias("any_above_250"),
    )


_NTH_ORACLE = """
WITH w AS (
  SELECT o_custkey,
         row_number() OVER win AS rn,
         first_value(o_orderkey) OVER win AS first_key,
         nth_value(o_orderkey, 2) OVER win AS second_key,
         last_value(o_orderkey) OVER win AS last_key,
         CAST(COUNT(*) OVER win AS BIGINT) AS n_orders
  FROM orders
  WINDOW win AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
SELECT o_custkey, first_key, second_key, last_key, n_orders
FROM w WHERE rn = 1
"""


@register("q_window_nth_value", oracle=_NTH_ORACLE)
def q_window_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional window access per customer: first, second, and last
    order key over the customer's full (date, key)-ordered history —
    first_value / nth_value / last_value with an explicit UNBOUNDED
    frame (last_value's default frame stops at CURRENT ROW: the classic
    silent-wrong-answer; the explicit frame is the fix, and the oracle
    pins it). Customers with one order surface second_key = NULL rather
    than dropping — the NULL is the information. One shuffle keyed by
    customer; row_number()=1 collapses to one row per key."""
    orders = load_table(spark, sf_dir, "orders")
    win = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    win_rn = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey"
    )
    w = orders.select(
        "o_custkey",
        F.row_number().over(win_rn).alias("rn"),
        F.first("o_orderkey").over(win).alias("first_key"),
        F.nth_value("o_orderkey", 2).over(win).alias("second_key"),
        F.last("o_orderkey").over(win).alias("last_key"),
        F.count(F.lit(1)).over(win).alias("n_orders"),
    )
    return w.filter(F.col("rn") == 1).drop("rn")


_URL_ORACLE = f"""
{E_CTE},
u AS (
  SELECT event_type, user_id,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM e)
SELECT 'shop.example.com' AS host,
       '/cat/' || event_type || '/item' AS path,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_uids,
       CAST(MAX(k) AS BIGINT) AS k_max
FROM u GROUP BY event_type
"""


@register("q_scalar_url", oracle=_URL_ORACLE)
def q_scalar_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing surface: construct canonical event URLs, then tear
    them back apart with try_parse_url (HOST / PATH / QUERY-param
    extraction) and aggregate on the parsed pieces — the clickstream
    normalization every web dataset needs. The oracle computes the
    expected components from the raw fields directly, so the test is
    that parse(construct(x)) round-trips exactly. try_parse_url (not
    parse_url) so a malformed URL in a 100 TB crawl yields NULL, not a
    job abort."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.select(
        "user_id",
        F.concat(
            F.lit("https://shop.example.com/cat/"),
            F.col("event_type"),
            F.lit("/item?uid="),
            F.col("user_id").cast("string"),
            F.lit("&k="),
            F.get_json_object("props", "$.k"),
        ).alias("url"),
    )
    parsed = u.select(
        "user_id",
        F.try_parse_url("url", F.lit("HOST")).alias("host"),
        F.try_parse_url("url", F.lit("PATH")).alias("path"),
        F.try_parse_url("url", F.lit("QUERY"), F.lit("k"))
        .cast("bigint")
        .alias("k"),
    )
    return parsed.groupBy("host", "path").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("n_uids"),
        F.max("k").alias("k_max"),
    )


_NULLFN_ORACLE = """
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(NULLIF(o_orderpriority, '5-LOW')) AS BIGINT)
         AS n_not_low,
       CAST(COUNT(*) FILTER (WHERE COALESCE(NULLIF(o_orderpriority,
            '5-LOW'), 'LOWEST') = 'LOWEST') AS BIGINT) AS n_low_tagged,
       CAST(MIN(GREATEST(o_orderdate, TIMESTAMP '1996-01-01')) AS DATE)
         AS clamp_min_day,
       CAST(MAX(LEAST(o_orderdate, TIMESTAMP '2000-01-01')) AS DATE)
         AS clamp_max_day
FROM orders GROUP BY o_orderstatus
"""


@register("q_scalar_null_handling", oracle=_NULLFN_ORACLE)
def q_scalar_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-combinator scalars end-to-end: NULLIF to void a sentinel
    value, COALESCE to re-tag it, GREATEST/LEAST to clamp dates into a
    window — composed and aggregated per order status. These are the
    functions that encode dirty-data policy declaratively (vs the
    reference's eval-and-hope parsing, SURVEY §2.A bugs); everything
    here stays in whole-stage codegen."""
    orders = load_table(spark, sf_dir, "orders")
    not_low = F.nullif("o_orderpriority", F.lit("5-LOW"))
    return orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.count(not_low).alias("n_not_low"),
        F.count_if(
            F.coalesce(not_low, F.lit("LOWEST")) == "LOWEST"
        ).alias("n_low_tagged"),
        F.min(
            F.greatest("o_orderdate", F.lit("1996-01-01").cast("timestamp_ntz"))
        )
        .cast("date")
        .alias("clamp_min_day"),
        F.max(
            F.least("o_orderdate", F.lit("2000-01-01").cast("timestamp_ntz"))
        )
        .cast("date")
        .alias("clamp_max_day"),
    )
