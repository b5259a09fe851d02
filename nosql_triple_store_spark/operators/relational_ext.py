"""Extended relational operators: percentiles, pivot, string aggregation,
conditional aggregates, array ops, lateral explode, deterministic
sampling, time-series resampling with gap fill (SURVEY §2.B families the
reference lacks entirely, rounded out beyond §2.C's minimum).

All remain single-shuffle declarative plans; cross-engine notes inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_PRIORITIES = [
    "1-URGENT",
    "2-HIGH",
    "3-MEDIUM",
    "4-NOT SPECIFIED",
    "5-LOW",
]


@register(
    "q_agg_percentiles",
    oracle="""
SELECT l_returnflag,
       ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity), 4)
         AS median_qty,
       ROUND(percentile_cont(0.9) WITHIN GROUP (ORDER BY l_quantity), 4)
         AS p90_qty,
       ROUND(percentile_cont(0.99) WITHIN GROUP (ORDER BY l_extendedprice), 4)
         AS p99_price
FROM lineitem GROUP BY l_returnflag
""",
)
def q_agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (linear interpolation — Spark `percentile` and
    DuckDB percentile_cont share the formula). At 100 TB prefer
    approx_percentile (t-digest, partial-aggregable); exact percentile
    collects per-group sorted buffers."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", F.lit(0.5)), 4).alias("median_qty"),
        F.round(F.percentile("l_quantity", F.lit(0.9)), 4).alias("p90_qty"),
        F.round(F.percentile("l_extendedprice", F.lit(0.99)), 4).alias(
            "p99_price"
        ),
    )


_PIVOT_ORACLE = f"""
SELECT o_orderstatus,
{", ".join(
    f"CAST(COALESCE(SUM(CASE WHEN o_orderpriority = '{p}' THEN 1 END), 0) "
    f"AS BIGINT) AS prio_{i + 1}"
    for i, p in enumerate(_PRIORITIES)
)}
FROM orders GROUP BY o_orderstatus
"""


@register("q_pivot", oracle=_PIVOT_ORACLE)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order counts, status × priority. Explicit pivot values (not
    inferred) — at scale, value inference is an extra distinct scan, and
    explicit values keep the output schema stable for the oracle."""
    orders = load_table(spark, sf_dir, "orders")
    out = (
        orders.groupBy("o_orderstatus")
        .pivot("o_orderpriority", _PRIORITIES)
        .count()
    )
    for i, p in enumerate(_PRIORITIES):
        out = out.withColumn(
            f"prio_{i + 1}", F.coalesce(F.col(f"`{p}`"), F.lit(0))
        ).drop(p)
    return out


@register(
    "q_string_agg",
    oracle="""
SELECT n.n_name,
       string_agg(DISTINCT c.c_mktsegment, ',' ORDER BY c.c_mktsegment)
         AS segments,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
)
def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String aggregation with deterministic ordering: collect_set →
    array_sort → concat_ws (the sort makes the value hash-stable; bare
    collect_list order is partition-dependent)."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.concat_ws(
                ",", F.array_sort(F.collect_set("c_mktsegment"))
            ).alias("segments"),
            F.count(F.lit(1)).alias("n_customers"),
        )
    )


@register(
    "q_conditional_agg",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) FILTER (WHERE value > 100) AS BIGINT) AS n_big,
       CAST(COUNT(*) FILTER (WHERE value <= 100) AS BIGINT) AS n_small,
       ROUND(COALESCE(SUM(value) FILTER (WHERE value > 100), 0), 2)
         AS big_total
FROM events GROUP BY event_type
""",
)
def q_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered aggregates (FILTER clause / count_if): one pass computes
    all conditional branches — never N filtered scans."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.count_if(F.col("value") > 100).alias("n_big"),
        F.count_if(F.col("value") <= 100).alias("n_small"),
        F.round(
            F.coalesce(
                F.sum(F.when(F.col("value") > 100, F.col("value"))), F.lit(0.0)
            ),
            2,
        ).alias("big_total"),
    )


@register(
    "q_array_ops",
    oracle="""
SELECT label,
       ROUND(AVG(CAST(embedding[1] AS DOUBLE)), 4) AS avg_first,
       ROUND(MAX(CAST(list_max(embedding) AS DOUBLE)), 4) AS max_elem,
       CAST(COUNT(*) FILTER (
         WHERE len(list_filter(embedding, x -> x > 2.0)) > 0) AS BIGINT)
         AS n_with_spike,
       CAST(COUNT(*) AS BIGINT) AS n_vecs
FROM embeddings GROUP BY label
""",
)
def q_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order ops as grouped aggregates: element access,
    array_max, existential filter — all JVM expressions."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.groupBy("label").agg(
        F.round(F.avg(F.element_at("embedding", 1).cast("double")), 4).alias(
            "avg_first"
        ),
        F.round(F.max(F.array_max("embedding").cast("double")), 4).alias(
            "max_elem"
        ),
        F.count_if(
            F.exists("embedding", lambda x: x > F.lit(2.0))
        ).alias("n_with_spike"),
        F.count(F.lit(1)).alias("n_vecs"),
    )


@register(
    "q_lateral_explode",
    oracle="""
WITH t AS (
  SELECT doc_id, list_filter(str_split(lower(text), ' '), x -> x <> '')
           AS toks
  FROM documents)
SELECT doc_id, CAST(i AS INT) - 1 AS pos, toks[i] AS token
FROM t CROSS JOIN unnest(range(1, 6)) AS r(i)
WHERE i <= len(toks)
""",
)
def q_lateral_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral/positional explode: first 5 tokens of each document with
    position (posexplode over a slice — expansion bounded pre-explode)."""
    from ..functions.textfns import tokens_col

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.posexplode(F.slice(tokens_col(), 1, 5)).alias("pos", "token"),
    )


@register(
    "q_sample_deterministic",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < '1a'
""",
)
def q_sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample by md5-prefix of the key — reproducible
    across engines/runs/cluster layouts, unlike TABLESAMPLE (which is
    partition-dependent). '1a' hex ≈ 26/256 ≈ 10.2% of keyspace."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 2) < "1a"
    ).select("o_orderkey", "o_custkey", "o_totalprice")


@register(
    "q_resample_daily",
    oracle="""
WITH e AS (
  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, value
  FROM events),
bounds AS (
  SELECT event_type, MIN(day) AS lo, MAX(day) AS hi FROM e
  GROUP BY event_type),
grid AS (
  SELECT event_type, CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY))
           AS DATE) AS day
  FROM bounds),
agg AS (
  SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS n_events,
         ROUND(SUM(value), 2) AS total_value
  FROM e GROUP BY event_type, day)
SELECT g.event_type, g.day,
       COALESCE(a.n_events, 0) AS n_events,
       ROUND(COALESCE(a.total_value, 0), 2) AS total_value
FROM grid g LEFT JOIN agg a
  ON g.event_type = a.event_type AND g.day = a.day
""",
)
def q_resample_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling with gap fill: per-type daily grid from
    sequence(min,max) + explode, left-joined with the daily aggregate,
    missing days zero-filled — the standard densification for training
    pipelines. The grid is tiny (types × days) so the join broadcasts."""
    events = load_table(spark, sf_dir, "events")
    e = events.select(
        "event_type", F.to_date("ts").alias("day"), "value"
    )
    agg = e.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    grid = (
        e.groupBy("event_type")
        .agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
        .select(
            "event_type",
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))
            ).alias("day"),
        )
    )
    return (
        F.broadcast(grid)
        .join(agg, ["event_type", "day"], "left")
        .select(
            "event_type",
            "day",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.round(F.coalesce("total_value", F.lit(0.0)), 2).alias(
                "total_value"
            ),
        )
    )
