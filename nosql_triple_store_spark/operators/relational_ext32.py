"""Thirty-second extension batch: exponentially time-decayed counters.

Lineage: decayed counts are the streaming-analytics freshness primitive
(trending topics, recency-weighted popularity, decayed CTR) — the
register semantics the reference's LWW store cannot express because it
keeps only the last write, not a recency-weighted history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .triple import E_CTE

_HALFLIFE_US = 7 * 86_400 * 1_000_000  # one week
_K_CAP = 20

_DECAY_ORACLE = f"""
{E_CTE},
x AS (SELECT event_type, epoch_us(ts) AS t FROM e),
m AS (SELECT MAX(t) AS now_us FROM x),
kd AS (
  SELECT event_type,
         LEAST((m.now_us - t) // {_HALFLIFE_US}, {_K_CAP}) AS k
  FROM x CROSS JOIN m)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       SUM(1.0 / (1 << k)) AS decayed_count,
       CAST(MIN(k) AS BIGINT) AS k_min,
       CAST(MAX(k) AS BIGINT) AS k_max
FROM kd GROUP BY event_type
"""


@register("q_events_decayed_count", oracle=_DECAY_ORACLE)
def q_events_decayed_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Half-life-decayed event counts per type: each event contributes
    2^-k where k = min(floor(age / 1 week), 20) and "now" is the
    corpus max timestamp (deterministic, data-derived). The bucketed
    exponent makes the float arithmetic EXACT: every weight is a dyadic
    rational with ≤ 20 fractional bits, so partial sums carry ≤ 53
    significant bits at any realistic count and the distributed sum is
    bit-identical to the oracle's sequential one REGARDLESS of
    accumulation order — no rounding needed, unlike a continuous
    exp(-λΔt) whose transcendental differs per engine. Ages use integer
    µs division (`div`), never float division (a double quotient can
    round up across a bucket boundary). One partial-aggregable
    aggregate after a broadcast 1-row "now"; at 100 TB the decay
    weights fold map-side like any sum."""
    ev = load_table(spark, sf_dir, "events")
    t = F.unix_micros(F.col("ts").cast("timestamp"))
    x = ev.select("event_type", t.alias("t"))
    now = x.agg(F.max("t").alias("now_us"))
    k = F.least(
        F.expr(f"(now_us - t) div {_HALFLIFE_US}"), F.lit(_K_CAP).cast("long")
    )
    return (
        x.crossJoin(F.broadcast(now))
        .select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.expr("1.0 / shiftleft(1, cast(k AS int))"))
            .alias("decayed_count"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
    )
