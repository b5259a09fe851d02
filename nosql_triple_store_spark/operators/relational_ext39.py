"""Thirty-ninth extension batch: nearest-neighbor as-of join and
classical seasonal decomposition.

Lineage: completes the temporal-join family (backward as-of =
q_join_asof, tolerance = q_join_asof_tolerance, interpolating =
q_join_asof_interpolate; NEAREST — pandas merge_asof
direction='nearest' — was the missing direction), and adds the
trend/seasonal/residual split (moving-average decomposition, the
pre-STL classic) over the daily event series.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .triple import E_CTE


@register(
    "q_join_asof_nearest",
    oracle=f"""
{E_CTE},
j AS (
  SELECT e.event_id, e.user_id, e.ts, o.o_orderkey,
         ABS(CAST(epoch_us(e.ts) AS BIGINT)
             - CAST(epoch_us(CAST(o.o_orderdate AS TIMESTAMP)) AS BIGINT))
           AS gap_us,
         row_number() OVER (
           PARTITION BY e.event_id
           ORDER BY ABS(CAST(epoch_us(e.ts) AS BIGINT)
                        - CAST(epoch_us(CAST(o.o_orderdate AS TIMESTAMP))
                               AS BIGINT)),
                    o.o_orderkey) AS rn
  FROM e JOIN orders o ON o.o_custkey = e.user_id)
SELECT event_id, user_id, ts, o_orderkey, gap_us
FROM j WHERE rn = 1
""",
)
def q_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join (pandas merge_asof direction='nearest'):
    each event pairs with the same-customer order whose date is
    CLOSEST in absolute time — before or after — ties broken by
    o_orderkey. The missing direction in the engine's as-of family;
    sensor/trade alignment uses it when causality doesn't matter but
    proximity does.

    Scale: identical shape to q_join_asof — one equi-shuffle on the
    customer key, then a partial-aggregable min per probe row (the
    oracle's per-event window is oracle-side only; the engine never
    windows over raw rows). Match-set growth per key is bounded by
    orders-per-customer.

    The (gap, orderkey) lexicographic argmin is packed into ONE
    decimal(35,0) — ``gap_us * 1e12 + o_orderkey`` — instead of
    ``min_by(struct, struct)``: struct-valued aggregates fall back to
    SortAggregate, which SORTS the full join output by the group keys
    on both sides of the shuffle (r7 sf1 profile: 29-33 s; the sort,
    not the join, dominated). Decimal min keeps the whole plan in
    HashAggregate with map-side partials — measured 2.1x faster and
    bit-identical, exact for any gap < 1e23 us and orderkey < 1e12.
    """
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    t_ev = F.unix_micros(F.col("ts").cast("timestamp"))
    t_or = F.unix_micros(F.col("o_orderdate").cast("timestamp"))
    j = events.join(orders, orders.o_custkey == events.user_id).select(
        "event_id",
        "user_id",
        "ts",
        "o_orderkey",
        F.abs(t_ev - t_or).alias("gap_us"),
    )
    pack_base = F.lit(1_000_000_000_000).cast("decimal(13,0)")
    packed = (
        F.col("gap_us").cast("decimal(20,0)") * pack_base
        + F.col("o_orderkey").cast("decimal(12,0)")
    )
    picked = j.groupBy("event_id", "user_id", "ts").agg(
        F.min(packed).alias("__p")
    )
    return picked.select(
        "event_id",
        "user_id",
        "ts",
        (F.col("__p") % pack_base).cast("long").alias("o_orderkey"),
        ((F.col("__p") - F.col("__p") % pack_base) / pack_base)
        .cast("long")
        .alias("gap_us"),
    )


_MA_HALF = 3  # 7-day centered moving average


@register(
    "q_events_seasonal_decompose",
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
  SELECT (isodow(day) - 1) AS dow,
         AVG(total - trend) AS seasonal
  FROM tr WHERE trend IS NOT NULL GROUP BY 1)
SELECT t.day, t.total,
       ROUND(t.trend, 2) + 0 AS trend,
       ROUND(s.seasonal, 2) + 0 AS seasonal,
       CASE WHEN t.trend IS NOT NULL
            THEN ROUND(t.total - t.trend - s.seasonal, 2) + 0 END
         AS residual
FROM tr t JOIN se s ON s.dow = (isodow(t.day) - 1)
""",
)
def q_events_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal decomposition of the daily value series:
    trend = 7-day centered moving average (defined only where the full
    window exists), seasonal = day-of-week mean of the detrended
    series, residual = total - trend - seasonal — the moving-average
    decomposition behind every ops-dashboard 'is this dip weekly
    seasonality or a real regression?' answer. Day boundaries are
    date-domain on the TZ-less timestamp (repo TZ-robustness rule);
    day-of-week is ISO weekday in both engines.

    Scale: the windows run over the DAILY aggregate (|days| rows, data
    reduced first — the SCALE.md exemption), never raw events; the
    day-of-week fold is a 7-row broadcast join back.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.round(F.sum("value"), 2).alias("total")
    )
    w = (
        Window.orderBy("day").rowsBetween(-_MA_HALF, _MA_HALF)
    )
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
    return (
        tr.join(F.broadcast(se), dow == se.dow)
        .select(
            "day",
            "total",
            (F.round("trend", 2) + F.lit(0.0)).alias("trend"),
            (F.round("seasonal", 2) + F.lit(0.0)).alias("seasonal"),
            F.when(
                F.col("trend").isNotNull(),
                F.round(
                    F.col("total") - F.col("trend") - F.col("seasonal"), 2
                )
                + F.lit(0.0),
            ).alias("residual"),
        )
    )
