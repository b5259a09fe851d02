"""Tenth extension batch: no-equi-key bucketed range join, exact bitmap
distinct rollup."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .triple import E_CTE

_BUCKET_S = 900  # 15-minute buckets == the join radius


@register(
    "q_join_range_bucket",
    oracle=f"""
{E_CTE},
p AS (SELECT event_id, ts FROM e WHERE event_type = 'purchase'),
err AS (SELECT ts FROM e WHERE event_type = 'error')
SELECT p.event_id,
       CAST(COUNT(err.ts) AS BIGINT) AS n_errors_within_15m
FROM p LEFT JOIN err
  ON err.ts >= p.ts - INTERVAL 15 MINUTE
 AND err.ts <= p.ts + INTERVAL 15 MINUTE
GROUP BY p.event_id
""",
)
def q_join_range_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join with NO equi key (errors within ±15 min of each
    purchase, across ALL users) — the pattern q_join_interval's
    docstring promises: a naive theta join is a cartesian product, so
    bucket both sides by 15-minute epochs, explode the probe side into
    {b-1, b, b+1}, and equi-join on the bucket. Every qualifying pair
    lands in EXACTLY one bucket (the build row's own), so no dedup pass
    is needed; the residual |dt| <= 15 min filters within buckets.
    Shuffle volume: 3x probe + 1x build, hashed on time bucket —
    at 100 TB this is the difference between a cartesian and a
    co-partitioned join whose width follows the time-bucket histogram.
    The oracle is the naive theta join (DuckDB's IEJoin handles it at
    fixture scale)."""
    events = load_table(spark, sf_dir, "events")
    epoch = lambda c: F.unix_timestamp(F.col(c).cast("timestamp"))  # noqa: E731
    p = events.filter(F.col("event_type") == "purchase").select(
        "event_id", F.col("ts").alias("p_ts"),
        F.floor(epoch("ts") / _BUCKET_S).alias("b"),
    )
    err = events.filter(F.col("event_type") == "error").select(
        F.col("ts").alias("e_ts"),
        F.floor(epoch("ts") / _BUCKET_S).alias("bucket"),
    )
    probe = p.select(
        "event_id", "p_ts",
        F.explode(
            F.array(F.col("b") - 1, F.col("b"), F.col("b") + 1)
        ).alias("bucket"),
    )
    hits = (
        probe.join(err, "bucket")
        .filter(
            (F.col("e_ts") >= F.col("p_ts") - F.expr("INTERVAL 15 MINUTE"))
            & (F.col("e_ts") <= F.col("p_ts") + F.expr("INTERVAL 15 MINUTE"))
        )
        .groupBy("event_id")
        .agg(F.count(F.lit(1)).alias("n_errors_within_15m"))
    )
    base = p.select("event_id")
    return (
        base.join(hits, "event_id", "left")
        .select(
            "event_id",
            F.coalesce("n_errors_within_15m", F.lit(0)).alias(
                "n_errors_within_15m"
            ),
        )
    )


@register(
    "q_agg_bitmap",
    oracle=f"""
{E_CTE}
SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM e GROUP BY event_type
""",
)
def q_agg_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via bitmap rollup (the Druid/ClickHouse
    bitmap-index pattern): user_id becomes (word = id div 64,
    bit = id mod 64); bit_or aggregates words per (event_type, word);
    bit_count + sum collapses to the distinct count. Both aggregates
    are partial-aggregable, and unlike COUNT(DISTINCT) the intermediate
    state is fixed-width words, not a per-group hash set of raw ids —
    bitmap fragments from disjoint partitions OR together, which also
    makes the rollup reusable across query granularities (OR the words
    again to coarsen). Same exact answer as COUNT(DISTINCT), which is
    the oracle."""
    events = load_table(spark, sf_dir, "events")
    words = (
        events.select(
            "event_type",
            (F.col("user_id") / 64).cast("long").alias("word"),
            # F.shiftleft takes a literal count; the per-row shift needs expr
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(user_id % 64 AS INT))"
            ).alias("bit"),
        )
        .groupBy("event_type", "word")
        .agg(F.bit_or("bit").alias("bits"))
    )
    return words.groupBy("event_type").agg(
        F.sum(F.bit_count("bits")).alias("n_users")
    )
