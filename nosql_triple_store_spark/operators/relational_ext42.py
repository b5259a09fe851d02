"""Forty-second extension batch: experimentation-platform statistics —
delta-method variance for ratio metrics and CUPED variance reduction.

Lineage: completes the engine's A/B testing shelf (q_events_abtest
two-proportion z, q_events_srm sample-ratio χ²) with the two
techniques every modern experimentation platform layers on top: ratio
metrics need the delta method because users (not events) are the
randomization unit, and CUPED uses pre-period behavior as a control
variate to shrink variance. Both reduce to second moments —
partial-aggregable avg/var/cov — so the plans are single-pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .triple import E_CTE

_R = lambda c: f"ROUND({c}, 6) + 0"  # noqa: E731


@register(
    "q_agg_delta_method",
    oracle=f"""
{E_CTE},
u AS (
  SELECT user_id,
         SUM(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END)
           AS x,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS DOUBLE) AS y
  FROM e GROUP BY user_id),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         AVG(x) AS mx, AVG(y) AS my,
         var_samp(x) AS vx, var_samp(y) AS vy,
         covar_samp(x, y) AS cxy
  FROM u)
SELECT n,
       {_R('mx / my')} AS ratio,
       {_R('(vx - 2 * (mx / my) * cxy + (mx / my) * (mx / my) * vy)'
           ' / (n * my * my)')} AS var_delta,
       {_R('SQRT((vx - 2 * (mx / my) * cxy + (mx / my) * (mx / my)'
           ' * vy) / (n * my * my))')} AS se_delta
FROM s
""",
)
def q_agg_delta_method(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method standard error for a ratio metric (revenue per
    purchase, randomized by USER): R = mean(x)/mean(y) over per-user
    aggregates, Var(R) ≈ (σx² − 2R·σxy + R²·σy²)/(n·ȳ²) — the
    correction naive per-event variance gets wrong whenever the
    denominator varies per user. The expression tree is written
    identically in both engines (same multiply/divide order), so the
    6-dp rounded outputs agree bit-for-bit.

    Scale: one per-user census (hash aggregation), then avg / var_samp
    / covar_samp over it — all partial-aggregable second moments; the
    final row is a constant-size reduce.
    """
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("value"))
            .otherwise(0.0)
        ).alias("x"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        )
        .cast("double")
        .alias("y"),
    )
    s = u.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        F.var_samp("x").alias("vx"),
        F.var_samp("y").alias("vy"),
        F.covar_samp("x", "y").alias("cxy"),
    )
    return s.selectExpr(
        "n",
        "ROUND(mx / my, 6) + 0 AS ratio",
        "ROUND((vx - 2 * (mx / my) * cxy + (mx / my) * (mx / my) * vy)"
        " / (n * my * my), 6) + 0 AS var_delta",
        "ROUND(SQRT((vx - 2 * (mx / my) * cxy + (mx / my) * (mx / my)"
        " * vy) / (n * my * my)), 6) + 0 AS se_delta",
    )


_CUPED_SPLIT = "2024-01-16"


@register(
    "q_events_cuped",
    oracle=f"""
{E_CTE},
u AS (
  SELECT user_id,
         SUM(CASE WHEN ts < TIMESTAMP '{_CUPED_SPLIT}'
                  THEN value ELSE 0 END) AS pre,
         SUM(CASE WHEN ts >= TIMESTAMP '{_CUPED_SPLIT}'
                  THEN value ELSE 0 END) AS post
  FROM e GROUP BY user_id),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         var_samp(pre) AS vpre, var_samp(post) AS vpost,
         covar_samp(pre, post) AS cpp
  FROM u)
SELECT n,
       {_R('cpp / vpre')} AS theta,
       {_R('vpost')} AS var_post,
       {_R('vpost - (cpp / vpre) * cpp')} AS var_cuped,
       CAST(FLOOR(((cpp / vpre) * cpp / vpost) * 1000000) AS BIGINT)
         AS reduction_ppm
FROM s
""",
)
def q_events_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (Deng et al., WSDM 2013): use each
    user's PRE-period spend as a control variate for the post-period
    metric — θ = cov(pre, post)/var(pre), adjusted variance =
    var(post) − θ·cov(pre, post), reduction = ρ². The experiment
    platform's cheapest sensitivity win: same data, tighter CIs. The
    calendar split is a constant timestamp literal in both engines
    (TZ-less domain).

    Scale: per-user census then second moments, identical single-pass
    shape to q_agg_delta_method; nothing beyond a hash aggregation
    and a constant-size reduce.
    """
    ev = load_table(spark, sf_dir, "events")
    split = F.lit(_CUPED_SPLIT).cast("timestamp_ntz")
    u = ev.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("ts") < split, F.col("value")).otherwise(0.0)
        ).alias("pre"),
        F.sum(
            F.when(F.col("ts") >= split, F.col("value")).otherwise(0.0)
        ).alias("post"),
    )
    s = u.agg(
        F.count(F.lit(1)).alias("n"),
        F.var_samp("pre").alias("vpre"),
        F.var_samp("post").alias("vpost"),
        F.covar_samp("pre", "post").alias("cpp"),
    )
    return s.selectExpr(
        "n",
        "ROUND(cpp / vpre, 6) + 0 AS theta",
        "ROUND(vpost, 6) + 0 AS var_post",
        "ROUND(vpost - (cpp / vpre) * cpp, 6) + 0 AS var_cuped",
        "CAST(FLOOR(((cpp / vpre) * cpp / vpost) * 1000000) AS BIGINT)"
        " AS reduction_ppm",
    )
