"""Fiftieth extension batch: seasonal-residual anomaly flags,
hierarchical share-of-parent, and experiment power analysis.

Lineage: three compositions over existing machinery. The anomaly flag
chains q_events_seasonal_decompose's residuals into a MAD gate (the
q_events_anomaly_mad robust-outlier rule applied where it belongs —
AFTER seasonality is removed, so weekly rhythm stops masquerading as
anomaly). Share-of-parent is the OLAP drill-down ratio every rollup
report shows beside the absolute. Power analysis closes the
experimentation shelf: given the metric's observed variance, how many
users per arm does the next test need?
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .triple import E_CTE

_MA_HALF = 3
_MAD_K = 3  # flag |residual| > K * MAD


@register(
    "q_events_anomaly_seasonal",
    oracle=f"""
{E_CTE},
daily AS (
  SELECT CAST(ts AS DATE) AS day, ROUND(SUM(value), 2) AS total
  FROM e GROUP BY 1),
tr AS (
  SELECT day, total,
         CASE WHEN COUNT(*) OVER w = {2 * _MA_HALF + 1}
              THEN AVG(total) OVER w END AS trend
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN {_MA_HALF} PRECEDING
                                     AND {_MA_HALF} FOLLOWING)),
se AS (
  SELECT (isodow(day) - 1) AS dow, AVG(total - trend) AS seasonal
  FROM tr WHERE trend IS NOT NULL GROUP BY 1),
res AS (
  SELECT t.day, t.total - t.trend - s.seasonal AS resid
  FROM tr t JOIN se s ON s.dow = (isodow(t.day) - 1)
  WHERE t.trend IS NOT NULL),
med AS (
  SELECT percentile_cont(0.5) WITHIN GROUP (ORDER BY resid) AS m
  FROM res),
mad AS (
  SELECT percentile_cont(0.5) WITHIN GROUP (ORDER BY ABS(resid - med.m))
           AS mad
  FROM res, med)
SELECT r.day, ROUND(r.resid, 2) + 0 AS residual,
       (ABS(r.resid - med.m) > {_MAD_K} * mad.mad) AS is_anomaly
FROM res r, med, mad
""",
)
def q_events_anomaly_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-aware anomaly flags: decompose the daily series
    (7-day moving-average trend + ISO-weekday seasonal — the
    q_events_seasonal_decompose machinery), then flag days whose
    RESIDUAL deviates from the residual median by more than
    {_MAD_K}x the residual MAD. Running the robust gate after
    deseasonalizing is the difference between paging on Mondays and
    paging on incidents. Interpolated medians are exact in both
    engines (q_agg_trimmed_stats precedent); the flag comparison uses
    the same IEEE expression on both sides.

    Scale: the windows run over the daily AGGREGATE; the two medians
    reduce |days| rows; the flag pass is a broadcast of 2 scalars.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.round(F.sum("value"), 2).alias("total")
    )
    w = Window.orderBy("day").rowsBetween(-_MA_HALF, _MA_HALF)
    tr = daily.select(
        "day",
        "total",
        F.when(
            F.count(F.lit(1)).over(w) == 2 * _MA_HALF + 1,
            F.avg("total").over(w),
        ).alias("trend"),
    )
    dow = F.weekday("day")
    se = (
        tr.filter(F.col("trend").isNotNull())
        .groupBy(dow.alias("dow"))
        .agg(F.avg(F.col("total") - F.col("trend")).alias("seasonal"))
    )
    res = (
        tr.filter(F.col("trend").isNotNull())
        .join(F.broadcast(se), dow == se.dow)
        .select(
            "day",
            (F.col("total") - F.col("trend") - F.col("seasonal")).alias(
                "resid"
            ),
        )
    )
    med = res.agg(F.percentile("resid", F.lit(0.5)).alias("m"))
    mad = (
        res.crossJoin(F.broadcast(med))
        .agg(
            F.percentile(
                F.abs(F.col("resid") - F.col("m")), F.lit(0.5)
            ).alias("mad")
        )
    )
    return (
        res.crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(mad))
        .select(
            "day",
            (F.round("resid", 2) + F.lit(0.0)).alias("residual"),
            (
                F.abs(F.col("resid") - F.col("m"))
                > _MAD_K * F.col("mad")
            ).alias("is_anomaly"),
        )
    )


@register(
    "q_agg_share_of_parent",
    oracle="""
WITH cn AS (
  SELECT n.n_regionkey AS region, c.c_nationkey AS nation,
         CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY 1, 2),
rg AS (SELECT region, SUM(cents) AS r_cents FROM cn GROUP BY region),
tot AS (SELECT SUM(cents) AS t_cents FROM cn)
SELECT cn.region, cn.nation, cn.cents,
       CAST(cn.cents * 1000000 // rg.r_cents AS BIGINT)
         AS share_of_region_ppm,
       CAST(rg.r_cents * 1000000 // tot.t_cents AS BIGINT)
         AS region_share_ppm
FROM cn JOIN rg USING (region), tot
""",
)
def q_agg_share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical share-of-parent: revenue per nation with its share
    of the region (ppm) and the region's share of the world — the
    drill-down ratio column every rollup report shows beside the
    absolute (complement of q_rollup's subtotal rows). Exact integer
    cents and floor-division ppm end to end.

    Scale: one fact aggregation to the (region, nation) grain (dims
    broadcast into the join), then two tiny re-aggregations broadcast
    back — the fact table is shuffled once, at its coarsest grain.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    cn = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_nationkey")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_regionkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(
            F.col("n_regionkey").alias("region"),
            F.col("c_nationkey").alias("nation"),
        )
        .agg(F.sum(cents).alias("cents"))
    )
    rg = cn.groupBy("region").agg(F.sum("cents").alias("r_cents"))
    tot = cn.agg(F.sum("cents").alias("t_cents"))
    return (
        cn.join(F.broadcast(rg), "region")
        .crossJoin(F.broadcast(tot))
        .select(
            "region",
            "nation",
            "cents",
            F.expr(
                "CAST(cents * 1000000 div r_cents AS BIGINT)"
            ).alias("share_of_region_ppm"),
            F.expr(
                "CAST(r_cents * 1000000 div t_cents AS BIGINT)"
            ).alias("region_share_ppm"),
        )
    )


# z_{0.975} and z_{0.8}: embedded as identical literals in both engines
_Z_ALPHA = 1.959964
_Z_BETA = 0.841621
_MDE_PPM = (50_000, 100_000, 200_000)  # relative MDE: 5%, 10%, 20%


@register(
    "q_events_power_analysis",
    oracle=f"""
{E_CTE},
u AS (
  SELECT user_id, SUM(value) AS metric FROM e GROUP BY user_id),
s AS (
  SELECT AVG(metric) AS mu, var_samp(metric) AS v,
         CAST(COUNT(*) AS BIGINT) AS n_users
  FROM u),
mde AS (SELECT unnest(ARRAY{list(_MDE_PPM)}) AS mde_ppm)
SELECT CAST(mde.mde_ppm AS BIGINT) AS mde_ppm, s.n_users,
       ROUND(s.mu, 4) + 0 AS metric_mean,
       CAST(CEIL(2.0 * ({_Z_ALPHA} + {_Z_BETA}) * ({_Z_ALPHA} + {_Z_BETA})
                 * s.v
                 / ((s.mu * mde.mde_ppm / 1000000.0)
                    * (s.mu * mde.mde_ppm / 1000000.0)))
            AS BIGINT) AS n_per_arm
FROM s, mde
""",
)
def q_events_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-size calculator from observed metric variance: for each
    relative minimum-detectable-effect (5/10/20%), the users-per-arm a
    two-sample test needs at α=0.05 / 80% power — n = 2(z_α+z_β)²σ²/δ²
    with δ = mde·mean. The planning step that closes the loop from
    q_agg_delta_method / q_events_cuped (measured variance) to the
    next experiment's design. z constants are embedded literals; the
    arithmetic tree is written identically in both engines and CEIL'd
    to integer users.

    Scale: per-user metric census + second moments — one pass; the MDE
    grid is a 3-row broadcast.
    """
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(F.sum("value").alias("metric"))
    s = u.agg(
        F.avg("metric").alias("mu"),
        F.var_samp("metric").alias("v"),
        F.count(F.lit(1)).alias("n_users"),
    )
    mde = spark.range(len(_MDE_PPM)).select(
        F.element_at(
            F.array(*[F.lit(m) for m in _MDE_PPM]),
            (F.col("id") + 1).cast("int"),
        ).alias("mde_ppm")
    )
    zz = f"({_Z_ALPHA} + {_Z_BETA}) * ({_Z_ALPHA} + {_Z_BETA})"
    return (
        s.crossJoin(F.broadcast(mde))
        .selectExpr(
            "CAST(mde_ppm AS BIGINT) AS mde_ppm",
            "n_users",
            "ROUND(mu, 4) + 0 AS metric_mean",
            f"CAST(CEIL(2.0 * {zz} * v"
            " / ((mu * mde_ppm / 1000000.0)"
            " * (mu * mde_ppm / 1000000.0))) AS BIGINT) AS n_per_arm",
        )
    )
