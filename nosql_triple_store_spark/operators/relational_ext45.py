"""Forty-fifth extension batch: robust (trimmed / winsorized)
statistics.

Lineage: the robust-mean pair every metrics pipeline reaches for when
q_events_anomaly_mad flags heavy tails — trim discards the tail mass,
winsorize clamps it — computed from exact interpolated percentiles
(the q_quantile_bins boundary convention) in one broadcast pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_agg_trimmed_stats",
    oracle="""
WITH b AS (
  SELECT percentile_cont(0.05) WITHIN GROUP (ORDER BY o_totalprice) AS p5,
         percentile_cont(0.95) WITHIN GROUP (ORDER BY o_totalprice) AS p95
  FROM orders),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         ROUND(AVG(o_totalprice), 4) + 0 AS mean_raw,
         ROUND(AVG(LEAST(GREATEST(o_totalprice, b.p5), b.p95)), 4) + 0
           AS mean_winsor,
         ROUND(AVG(CASE WHEN o_totalprice BETWEEN b.p5 AND b.p95
                        THEN o_totalprice END), 4) + 0 AS mean_trimmed,
         CAST(SUM(CASE WHEN o_totalprice < b.p5
                        OR o_totalprice > b.p95
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped
  FROM orders, b)
SELECT n, mean_raw, mean_winsor, mean_trimmed, n_clamped,
       ROUND((SELECT p5 FROM b), 4) + 0 AS p5,
       ROUND((SELECT p95 FROM b), 4) + 0 AS p95
FROM s
""",
)
def q_agg_trimmed_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust means of order totals: 5/95 winsorized (tails CLAMPED to
    the percentile bounds) and trimmed (tails DROPPED), beside the raw
    mean and the clamp census — the outlier-resistant summary that
    makes revenue dashboards stable under a single whale order. The
    cut points are exact linearly-interpolated percentiles, identical
    in both engines (q_quantile_bins precedent); boundary membership
    is BETWEEN on both sides.

    Scale: one exact-percentile pass (Spark's percentile is a
    partial-aggregable sketchless fold here), broadcast of the 2 cut
    points, then a single scan computing all three means at once —
    never a sort of the full table.
    """
    orders = load_table(spark, sf_dir, "orders")
    b = orders.agg(
        F.percentile("o_totalprice", F.lit(0.05)).alias("p5"),
        F.percentile("o_totalprice", F.lit(0.95)).alias("p95"),
    )
    x = F.col("o_totalprice")
    s = orders.crossJoin(F.broadcast(b)).agg(
        F.count(F.lit(1)).alias("n"),
        (F.round(F.avg(x), 4) + F.lit(0.0)).alias("mean_raw"),
        (
            F.round(
                F.avg(F.least(F.greatest(x, F.col("p5")), F.col("p95"))), 4
            )
            + F.lit(0.0)
        ).alias("mean_winsor"),
        (
            F.round(
                F.avg(
                    F.when(
                        x.between(F.col("p5"), F.col("p95")), x
                    )
                ),
                4,
            )
            + F.lit(0.0)
        ).alias("mean_trimmed"),
        F.sum(
            F.when(
                (x < F.col("p5")) | (x > F.col("p95")), 1
            ).otherwise(0)
        ).alias("n_clamped"),
        (F.round(F.max("p5"), 4) + F.lit(0.0)).alias("p5"),
        (F.round(F.max("p95"), 4) + F.lit(0.0)).alias("p95"),
    )
    return s.select(
        "n",
        "mean_raw",
        "mean_winsor",
        "mean_trimmed",
        "n_clamped",
        "p5",
        "p95",
    )
