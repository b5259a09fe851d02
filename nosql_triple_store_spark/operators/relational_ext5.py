"""Fifth extension batch: CDC-style table diff, deterministic mode,
nested-JSON construction/parsing roundtrip."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .triple import E_CTE

_CDC_ORACLE = f"""
{E_CTE},
ranked AS (
  SELECT user_id, event_type, event_id, ts, value,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM e),
v1 AS (SELECT user_id, event_type, event_id, value FROM (
  SELECT user_id, event_type, event_id, ts, value,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM e WHERE ts < TIMESTAMP '2024-01-20') WHERE rn = 1),
v2 AS (SELECT user_id, event_type, event_id, value FROM ranked WHERE rn = 1)
SELECT COALESCE(v1.user_id, v2.user_id) AS user_id,
       COALESCE(v1.event_type, v2.event_type) AS event_type,
       CASE WHEN v1.user_id IS NULL THEN 'added'
            WHEN v2.user_id IS NULL THEN 'removed'
            ELSE 'changed' END AS change,
       v1.event_id AS old_event_id, v2.event_id AS new_event_id
FROM v1 FULL JOIN v2
  ON v1.user_id = v2.user_id AND v1.event_type = v2.event_type
WHERE v1.user_id IS NULL OR v2.user_id IS NULL
   OR v1.event_id <> v2.event_id OR v1.value <> v2.value
"""


@register("q_cdc_diff", oracle=_CDC_ORACLE)
def q_cdc_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture diff between two register versions (state as
    of Jan 20 vs final): added / removed / changed keys via full outer
    join on the register key — the read-side companion of
    sources/compaction.py (what changed between v_n and v_{n+1}).
    Keys exist only in v2 here ('added' dominates); the operator handles
    all three change kinds."""
    from ..functions.lww import latest_by_key

    events = load_table(spark, sf_dir, "events")
    keys, order = ["user_id", "event_type"], ["ts", "event_id"]
    payload = ["event_id", "ts", "value"]
    v1 = latest_by_key(
        events.filter(F.col("ts") < F.lit("2024-01-20").cast("timestamp_ntz")),
        keys, order, payload,
    ).select(
        "user_id", "event_type",
        F.col("event_id").alias("old_event_id"),
        F.col("value").alias("old_value"),
    )
    v2 = latest_by_key(events, keys, order, payload).select(
        "user_id", "event_type",
        F.col("event_id").alias("new_event_id"),
        F.col("value").alias("new_value"),
    )
    j = v1.join(v2, keys, "full_outer")
    return (
        j.filter(
            F.col("old_event_id").isNull()
            | F.col("new_event_id").isNull()
            | (F.col("old_event_id") != F.col("new_event_id"))
            | (F.col("old_value") != F.col("new_value"))
        )
        .select(
            "user_id",
            "event_type",
            F.when(F.col("old_event_id").isNull(), "added")
            .when(F.col("new_event_id").isNull(), "removed")
            .otherwise("changed")
            .alias("change"),
            "old_event_id",
            "new_event_id",
        )
    )


@register(
    "q_agg_mode",
    oracle=f"""
{E_CTE},
counts AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM e GROUP BY user_id, event_type),
ranked AS (
  SELECT user_id, event_type, n,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY n DESC, event_type) AS rn
  FROM counts)
SELECT user_id, event_type AS mode_event_type, n AS n_occurrences
FROM ranked WHERE rn = 1
""",
)
def q_agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mode: most frequent event_type per user, ties by
    lexicographic order. Built as count + max_by((n, reversed-tiebreak))
    rather than the builtin mode() whose tie choice is engine-arbitrary —
    determinism is constructed, not hoped for."""
    events = load_table(spark, sf_dir, "events")
    counts = events.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    # max over (n, neg-lexicographic type): encode 'smallest type wins on
    # tie' by max_by over (n, struct-inverted type) — simplest exact form
    # is min_by over (-n, type).
    picked = counts.groupBy("user_id").agg(
        F.min_by(
            F.struct("event_type", "n"), F.struct(-F.col("n"), F.col("event_type"))
        ).alias("__m")
    )
    return picked.select(
        "user_id",
        F.col("__m.event_type").alias("mode_event_type"),
        F.col("__m.n").alias("n_occurrences"),
    )


@register(
    "q_json_nested",
    oracle="""
WITH built AS (
  SELECT o_orderkey,
         json_object('cust', o_custkey, 'status', o_orderstatus,
                     'price', ROUND(o_totalprice, 2)) AS doc
  FROM orders)
SELECT CAST(json_extract(doc, '$.cust') AS BIGINT) AS cust,
       json_extract_string(doc, '$.status') AS status,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(CAST(json_extract(doc, '$.price') AS DOUBLE)), 2)
         AS total_price
FROM built GROUP BY 1, 2
""",
)
def q_json_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON construct→parse roundtrip: build a JSON document per order
    (to_json over a struct), then parse it back with a schema (from_json)
    and aggregate on the extracted fields — the serialize/deserialize
    cycle semi-structured pipelines live on, all codegen'd."""
    orders = load_table(spark, sf_dir, "orders")
    built = orders.select(
        F.to_json(
            F.struct(
                F.col("o_custkey").alias("cust"),
                F.col("o_orderstatus").alias("status"),
                F.round("o_totalprice", 2).alias("price"),
            )
        ).alias("doc")
    )
    parsed = built.select(
        F.from_json(
            "doc", "cust long, status string, price double"
        ).alias("j")
    )
    return (
        parsed.select(
            F.col("j.cust").alias("cust"), F.col("j.status").alias("status"),
            F.col("j.price").alias("price"),
        )
        .groupBy("cust", "status")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("price"), 2).alias("total_price"),
        )
    )
