"""Fourth extension batch: RANGE window frames, interval (range) joins,
min_by first-touch attribution, ordered event-path aggregation."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .triple import E_CTE


@register(
    "q_window_range_frame",
    oracle=f"""
{E_CTE},
t AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, value FROM e)
SELECT user_id, event_id,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_last_hour,
       ROUND(SUM(value) OVER w, 2) AS value_last_hour
FROM t
WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
""",
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event time: per event, count/sum of the same
    user's events in the trailing hour — the value-based frame ROWS can't
    express (frame width varies with event density). Ordered on integer
    epoch µs so frame bounds are exact in both engines."""
    events = load_table(spark, sf_dir, "events")
    t = events.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "value",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-3600_000_000, Window.currentRow)
    )
    return t.select(
        "user_id",
        "event_id",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
        F.round(F.sum("value").over(w), 2).alias("value_last_hour"),
    )


@register(
    "q_join_interval",
    oracle="""
SELECT o.o_orderkey,
       CAST(COUNT(l.l_orderkey) AS BIGINT) AS n_shipped_within_30d,
       ROUND(COALESCE(SUM(l.l_extendedprice), 0), 2) AS shipped_value
FROM orders o
LEFT JOIN lineitem l
  ON l.l_orderkey = o.o_orderkey
 AND l.l_shipdate >= o.o_orderdate
 AND l.l_shipdate < o.o_orderdate + INTERVAL 30 DAY
GROUP BY o.o_orderkey
""",
)
def q_join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: lineitems shipped within 30 days of their order's
    date. The equi-key (orderkey) carries the hash partitioning; the time
    interval is a residual predicate — never a cartesian. (For interval
    joins with NO equi key, the scale pattern is bucketing both sides by
    coarse time bucket and joining bucket±1.)"""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_extendedprice"
    )
    j = orders.join(
        li,
        (li.l_orderkey == orders.o_orderkey)
        & (li.l_shipdate >= orders.o_orderdate)
        & (li.l_shipdate < orders.o_orderdate + F.expr("INTERVAL 30 DAY")),
        "left",
    )
    return j.groupBy("o_orderkey").agg(
        F.count("l_orderkey").alias("n_shipped_within_30d"),
        F.round(F.coalesce(F.sum("l_extendedprice"), F.lit(0.0)), 2).alias(
            "shipped_value"
        ),
    )


@register(
    "q_first_touch",
    oracle=f"""
{E_CTE},
ranked AS (
  SELECT user_id, event_type, ts, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM e)
SELECT user_id, event_type AS first_event_type, ts AS first_ts,
       value AS first_value
FROM ranked WHERE rn = 1
""",
)
def q_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution: each user's earliest event via min_by —
    the dual of the LWW register read (min instead of max over the same
    (ts, event_id) ordering), same partial-aggregable shape."""
    events = load_table(spark, sf_dir, "events")
    ordering = F.struct(F.col("ts"), F.col("event_id"))
    payload = F.struct(F.col("event_type"), F.col("ts"), F.col("value"))
    return (
        events.groupBy("user_id")
        .agg(F.min_by(payload, ordering).alias("__r"))
        .select(
            "user_id",
            F.col("__r.event_type").alias("first_event_type"),
            F.col("__r.ts").alias("first_ts"),
            F.col("__r.value").alias("first_value"),
        )
    )


@register(
    "q_session_paths",
    oracle=f"""
{E_CTE},
t AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)
                   >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM e),
s AS (
  SELECT user_id, ts, event_id, event_type,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM t),
p AS (
  SELECT user_id, sess_id,
         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
  FROM s GROUP BY user_id, sess_id)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM p GROUP BY path ORDER BY n_sessions DESC, path LIMIT 25
""",
)
def q_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionized event paths: per (user, 30-min session) the ordered
    '>'-joined event-type sequence, then the top-25 most common paths —
    funnel analysis over the gaps-and-islands sessionization. Path order
    comes from array_sort over (ts, event_id)-keyed structs, so the
    string is deterministic under any partitioning."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = events.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        # gap computed at µs precision — a seconds-granularity cast would
        # misclassify gaps within 1s of the boundary vs the oracle
        F.when(
            (
                F.unix_micros(F.col("ts").cast("timestamp"))
                - F.lag(
                    F.unix_micros(F.col("ts").cast("timestamp"))
                ).over(w)
            )
            >= 1_800_000_000,
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    sess = flagged.withColumn(
        "sess_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    paths = sess.groupBy("user_id", "sess_id").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda s: s.event_type,
            ),
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(25)
    )
