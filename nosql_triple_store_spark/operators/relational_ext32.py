"""Thirty-second extension batch: exponentially time-decayed counters
and the bucketed range join.

Lineage: decayed counts are the streaming-analytics freshness primitive
(trending topics, recency-weighted popularity, decayed CTR) — the
register semantics the reference's LWW store cannot express because it
keeps only the last write, not a recency-weighted history. The bucketed
range join is the scale-safe form of point-in-interval matching
(incident attribution, ad-to-impression windows, sensor-to-maintenance
correlation) that a naive engine executes as a nested loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .triple import E_CTE
from ..materialize import materialize

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


_HOUR_US = 3600 * 1_000_000
_INCIDENT_VALUE = 4.5

_RANGE_JOIN_ORACLE = f"""
{E_CTE},
x AS (SELECT event_id, event_type, CAST(epoch_us(ts) AS BIGINT) AS t, value
      FROM e),
inc AS (SELECT event_type, t AS s, t + {_HOUR_US} AS en
        FROM x WHERE value >= {_INCIDENT_VALUE}),
cov AS (
  SELECT DISTINCT p.event_type, p.event_id
  FROM x p JOIN inc i
    ON p.event_type = i.event_type AND p.t >= i.s AND p.t < i.en),
tot AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_points
        FROM x GROUP BY event_type),
ni AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_incidents
       FROM inc GROUP BY event_type),
nc AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_covered
       FROM cov GROUP BY event_type)
SELECT t.event_type,
       COALESCE(ni.n_incidents, 0) AS n_incidents,
       COALESCE(nc.n_covered, 0) AS n_covered,
       t.n_points,
       ROUND(COALESCE(nc.n_covered, 0) * 1.0 / t.n_points, 4)
         AS covered_ratio
FROM tot t
LEFT JOIN ni ON t.event_type = ni.event_type
LEFT JOIN nc ON t.event_type = nc.event_type
"""


@register("q_join_range_bucketed", oracle=_RANGE_JOIN_ORACLE)
def q_join_range_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join, bucketed: high-value events (value ≥
    4.5) open 1-hour incident windows; count how many same-type events
    fall inside ≥1 window. The interval predicate `s <= t < s+1h` is
    NOT executed as an inequality join (a BroadcastNestedLoop at scale)
    and — since the window length EQUALS the bucket width — not even as
    a point×window pair join (which the r7 sf1 sweep measured quadratic
    in event density: 53 s at 1M events): a point t in hour-bucket b is
    covered iff some same-bucket incident starts at-or-before t (any
    such start is automatically within the hour) OR the latest
    incident start in bucket b-1 lies after t - 1h. Both conditions
    read one per-(type, bucket) min/max AGGREGATE row, so the plan is
    two equi-joins of points against an incident-bucket summary —
    O(points + incident_buckets), no pair enumeration, exact.
    tests/test_plans.py asserts the physical plan has no
    nested-loop/cartesian node. All-integer µs arithmetic; ratios are
    exact ints rounded at 4 dp."""
    ev = load_table(spark, sf_dir, "events")
    x = ev.select(
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
        "value",
    )
    inc = x.filter(F.col("value") >= _INCIDENT_VALUE).select(
        "event_type", F.col("t").alias("s"), (F.col("t") + _HOUR_US).alias("en")
    )
    bs = (
        inc.select(
            "event_type", "s", F.expr(f"s div {_HOUR_US}").alias("b")
        )
        .groupBy("event_type", "b")
        .agg(F.min("s").alias("mn_s"), F.max("s").alias("mx_s"))
    )
    cur = bs.select("event_type", "b", "mn_s")
    prv = bs.select(
        "event_type", (F.col("b") + 1).alias("b"), F.col("mx_s").alias("pv_s")
    )
    pts = x.select(
        "event_type", "event_id", "t", F.expr(f"t div {_HOUR_US}").alias("b")
    )
    cov = (
        pts.join(cur, ["event_type", "b"], "left")
        .join(prv, ["event_type", "b"], "left")
        .filter(
            (F.col("mn_s") <= F.col("t"))
            | (F.col("pv_s") > F.col("t") - _HOUR_US)
        )
        .select("event_type", "event_id")
    )
    tot = x.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_points"))
    ni = inc.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_incidents")
    )
    nc = cov.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_covered"))
    out = (
        tot.join(ni, "event_type", "left")
        .join(nc, "event_type", "left")
        .select(
            "event_type",
            F.coalesce("n_incidents", F.lit(0)).alias("n_incidents"),
            F.coalesce("n_covered", F.lit(0)).alias("n_covered"),
            "n_points",
            F.round(
                F.coalesce("n_covered", F.lit(0)) * F.lit(1.0)
                / F.col("n_points"),
                4,
            ).alias("covered_ratio"),
        )
    )
    return out



_MAD_K = 3  # flag |x - median| > 3 * MAD

_ANOMALY_ORACLE = f"""
{E_CTE},
x AS (SELECT event_id, event_type, value FROM e),
med AS (
  SELECT event_type, MIN(value) AS med FROM (
    SELECT event_type, value,
           ROW_NUMBER() OVER (PARTITION BY event_type
                              ORDER BY value, event_id) AS rn,
           COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM x)
  WHERE rn * 2 >= n GROUP BY event_type),
dev AS (
  SELECT x.event_id, x.event_type, x.value, ABS(x.value - med.med) AS d,
         med.med
  FROM x JOIN med USING (event_type)),
mad AS (
  SELECT event_type, MIN(d) AS mad FROM (
    SELECT event_type, d,
           ROW_NUMBER() OVER (PARTITION BY event_type
                              ORDER BY d, event_id) AS rn,
           COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM dev)
  WHERE rn * 2 >= n GROUP BY event_type)
SELECT dev.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MIN(dev.med) AS median_value,
       MIN(mad.mad) AS mad,
       CAST(COUNT(*) FILTER (WHERE dev.d > {_MAD_K} * mad.mad) AS BIGINT)
         AS n_outliers,
       MAX(dev.d) AS max_abs_dev
FROM dev JOIN mad USING (event_type)
GROUP BY dev.event_type
"""


@register("q_events_anomaly_mad", oracle=_ANOMALY_ORACLE)
def q_events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection per event type: median/MAD outlier
    census (|x − median| > 3·MAD) — the heavy-tail-safe alternative to
    mean/stddev z-scores. Both medians are EXACT lower medians via the
    rank-crossing trick (rn·2 ≥ n over a (value, event_id)-ordered
    window — integer comparison, no n/2 float); the median and MAD are
    then actual data values / one IEEE subtraction, so every comparison
    is bit-identical cross-engine with no rounding anywhere. Windows
    partition by event_type (parallel across types); at 100 TB swap the
    exact in-type sort for approx_percentile or the bucketed-quantile
    helper (functions/prefix.py) — the exact variant here is the
    correctness oracle for that swap."""
    ev = load_table(spark, sf_dir, "events")
    x = ev.select("event_id", "event_type", "value")

    def lower_median(df: DataFrame, val: str, out: str) -> DataFrame:
        w = Window.partitionBy("event_type").orderBy(val, "event_id")
        wn = Window.partitionBy("event_type")
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .withColumn("__n", F.count(F.lit(1)).over(wn))
            .filter(F.col("__rn") * 2 >= F.col("__n"))
            .groupBy("event_type")
            .agg(F.min(val).alias(out))
        )

    med = lower_median(x, "value", "med")
    dev = (
        x.join(med, "event_type")
        .withColumn("d", F.abs(F.col("value") - F.col("med")))
        .transform(materialize)  # consumed by the MAD median AND the final
        # census — unchecked, the median join + window run twice
    )
    mad = lower_median(
        dev.select("event_type", "event_id", F.col("d").alias("value")),
        "value",
        "mad",
    )
    return (
        dev.join(mad, "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("med").alias("median_value"),
            F.min("mad").alias("mad"),
            F.count_if(F.col("d") > _MAD_K * F.col("mad")).alias(
                "n_outliers"
            ),
            F.max("d").alias("max_abs_dev"),
        )
    )
