"""Event-time window operators: tumbling / sliding / session
(SURVEY §2.C; reference has no streaming constructs — §2.B — its changelog
dict is the closest analog, SQLite3DBConnector.py:83).

Written batch-first with F.window / F.session_window so the identical
expressions lift to Structured Streaming (streaming/ module adds
readStream + watermark around the same plans). Window starts align to the
epoch grid; all timestamps are timestamp_ntz so bucket edges are
timezone-independent and match DuckDB's time_bucket/date_trunc.

Scale notes: tumbling/sliding windows are plain hash aggregations on
(window, key) — partial-aggregable, one shuffle; the sliding variant
expands each row into window_duration/slide copies *before* partial agg
(4x here), still no sort. Session windows shuffle by user and merge
per-key sorted runs; bounded per-user event counts keep partitions small,
and AQE skew-split handles hot users.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .triple import E_CTE


@register(
    "q_tumbling_window",
    oracle=f"""
{E_CTE}
SELECT date_trunc('hour', ts) AS win_start, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 2) AS total_value
FROM e GROUP BY 1, 2
""",
)
def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events per 1-hour tumbling window per type. F.window('1 hour')
    start == date_trunc('hour') since both align to the epoch grid."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("win_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


_SLIDING_ORACLE = f"""
{E_CTE},
expanded AS (
  SELECT time_bucket(INTERVAL 15 MINUTE, ts) - k * INTERVAL 15 MINUTE
           AS win_start,
         event_type, value
  FROM e CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k))
SELECT win_start, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 2) AS total_value
FROM expanded GROUP BY 1, 2
"""


@register("q_sliding_window", oracle=_SLIDING_ORACLE)
def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events per 1-hour window sliding every 15 min: each event lands in
    exactly 4 windows (oracle mirrors via explicit 0..3 offset expansion
    from the 15-min bucket)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour", "15 minutes"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("win_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


_SESSION_ORACLE = f"""
{E_CTE},
t AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)
                   >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM e),
s AS (
  SELECT user_id, ts, value,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM t)
SELECT user_id, MIN(ts) AS session_start,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 2) AS total_value
FROM s GROUP BY user_id, sess_id
"""


@register("q_session_window", oracle=_SESSION_ORACLE)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessions with a 30-minute inactivity gap.

    Boundary semantics (SURVEY §7.4): Spark session windows are [start,
    end) with end = last_ts + gap, so an event exactly 30 min after the
    previous one starts a NEW session — the oracle's gaps-and-islands
    flag uses `>=` to encode the same rule.
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
            "total_value",
        )
    )
