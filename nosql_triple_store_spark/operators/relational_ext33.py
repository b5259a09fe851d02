"""Thirty-third extension batch: time-series diagnostics in exact
integer arithmetic — autocorrelation and CUSUM changepoint over the
daily event census.

Lineage: the monitoring layer every event pipeline runs on its volume
series (is traffic periodic? did the level shift, and when?). Both are
float-free until one final division: counts are ints, the mean is the
rational S/T, and clearing denominators (multiply through by T) turns
every intermediate into an exact int well under 2^53 — the same
exact-sufficient-statistic trick as q_agg_corr_regr/q_graph_modularity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .triple import E_CTE

_MAX_LAG = 7

_DAILY_SQL = f"""
{E_CTE},
daily AS (
  SELECT event_type, CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM e GROUP BY 1, 2),
tot AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS t,
         CAST(SUM(n) AS BIGINT) AS s
  FROM daily GROUP BY event_type)
"""

_ACF_ORACLE = f"""
{_DAILY_SQL},
lagged AS (
  SELECT d.event_type, d.day, d.n,
         g.lag AS lag,
         LAG(d.n, g.lag) OVER (PARTITION BY d.event_type, g.lag
                               ORDER BY d.day) AS n_lag
  FROM daily d CROSS JOIN
       (SELECT unnest(range(1, {_MAX_LAG} + 1)) AS lag) g),
parts AS (
  SELECT l.event_type, l.lag,
         SUM((tot.t * l.n - tot.s) * (tot.t * l.n_lag - tot.s)) AS num,
         MIN(tot.t) AS t
  FROM lagged l JOIN tot ON l.event_type = tot.event_type
  WHERE l.n_lag IS NOT NULL
  GROUP BY 1, 2),
dens AS (
  SELECT d.event_type,
         SUM((tot.t * d.n - tot.s) * (tot.t * d.n - tot.s)) AS den
  FROM daily d JOIN tot ON d.event_type = tot.event_type
  GROUP BY 1)
SELECT p.event_type, CAST(p.lag AS BIGINT) AS lag,
       ROUND(p.num * 1.0 / dens.den, 4) AS acf
FROM parts p JOIN dens ON p.event_type = dens.event_type
"""


@register("q_events_acf", oracle=_ACF_ORACLE)
def q_events_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the daily event-count series at lags 1..7,
    per event type — the periodicity probe (a weekly cycle shows as a
    lag-7 peak). All intermediates are exact ints: counts n are ints,
    and multiplying deviations through by T turns (n − S/T) into
    (T·n − S); products stay < 2^53 for any per-type daily series this
    engine would census. The single float op is the final num/den
    division, rounded once at 4 dp — bit-identical cross-engine. The
    lag windows run over the per-type DAILY AGGREGATE (≤ a few hundred
    rows per type), not raw events, so the per-type sort is bounded by
    an aggregate — the engine's accepted global-window shape."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.col("ts").cast("date").cast("timestamp_ntz").alias("day"),
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("t"), F.sum("n").alias("s")
    )
    lags = spark.range(1, _MAX_LAG + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    # Spark's lag() wants a FOLDABLE offset, so the variable-lag shift
    # is a positional self-join on per-type row numbers instead — the
    # same rows the oracle's LAG(n, g.lag) pairs up.
    w = Window.partitionBy("event_type").orderBy("day")
    idx = daily.withColumn("i", F.row_number().over(w))
    cur = idx.crossJoin(F.broadcast(lags))
    prev = idx.select(
        "event_type",
        F.col("i").alias("i_prev"),
        F.col("n").alias("n_lag"),
    )
    lagged = cur.join(
        prev,
        (cur["event_type"] == prev["event_type"])
        & (prev["i_prev"] == cur["i"] - cur["lag"]),
    ).select(cur["event_type"], "lag", "n", "n_lag")
    dev = lambda c: F.col("t") * F.col(c) - F.col("s")  # noqa: E731
    parts = (
        lagged.join(tot, "event_type")
        .groupBy("event_type", "lag")
        .agg(F.sum(dev("n") * dev("n_lag")).alias("num"))
    )
    dens = (
        daily.join(tot, "event_type")
        .groupBy("event_type")
        .agg(F.sum(dev("n") * dev("n")).alias("den"))
    )
    return (
        parts.join(dens, "event_type")
        .select(
            "event_type",
            F.col("lag").cast("long").alias("lag"),
            F.round(F.col("num") * F.lit(1.0) / F.col("den"), 4).alias(
                "acf"
            ),
        )
    )


_CUSUM_ORACLE = f"""
{_DAILY_SQL},
cum AS (
  SELECT d.event_type, d.day, tot.t, tot.s,
         CAST(SUM(d.n) OVER (PARTITION BY d.event_type ORDER BY d.day
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c,
         CAST(ROW_NUMBER() OVER (PARTITION BY d.event_type
                                 ORDER BY d.day) AS BIGINT) AS i
  FROM daily d JOIN tot ON d.event_type = tot.event_type),
g AS (
  SELECT event_type, day, t * c - i * s AS dev
  FROM cum),
best AS (
  SELECT event_type, day, dev,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY ABS(dev) DESC, day) AS rn
  FROM g)
SELECT b.event_type, b.day AS changepoint_day,
       CAST(b.dev AS BIGINT) AS scaled_dev,
       ROUND(b.dev * 1.0 / (tot.t * tot.s), 6) AS rel_dev
FROM best b JOIN tot ON b.event_type = tot.event_type
WHERE b.rn = 1
"""


@register("q_events_changepoint", oracle=_CUSUM_ORACLE)
def q_events_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint per event type: the day where the cumulative
    deviation of daily counts from the overall mean is largest in
    magnitude — the level-shift detector (deploys, outages, data bugs).
    Clearing the S/T mean denominator gives dev_i = T·C_i − i·S, an
    exact int, so the argmax (ties → earliest day) is bit-stable; the
    reported relative deviation is one division rounded at 6 dp.
    Windows run over the per-type daily aggregate — bounded input, same
    shape as q_events_acf."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.col("ts").cast("date").cast("timestamp_ntz").alias("day"),
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("t"), F.sum("n").alias("s")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    cum = (
        daily.join(tot, "event_type")
        .withColumn(
            "c",
            F.sum("n").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .withColumn("i", F.row_number().over(w).cast("long"))
    )
    g = cum.select(
        "event_type",
        "day",
        "t",
        "s",
        (F.col("t") * F.col("c") - F.col("i") * F.col("s")).alias("dev"),
    )
    w_best = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("dev")).desc(), F.asc("day")
    )
    return (
        g.withColumn("rn", F.row_number().over(w_best))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("day").alias("changepoint_day"),
            F.col("dev").alias("scaled_dev"),
            F.round(
                F.col("dev") * F.lit(1.0) / (F.col("t") * F.col("s")), 6
            ).alias("rel_dev"),
        )
    )


_SRM_ORACLE = f"""
{E_CTE},
assign AS (
  SELECT DISTINCT user_id, user_id % 2 AS variant FROM e),
counts AS (
  SELECT CAST(COUNT(*) FILTER (WHERE variant = 0) AS BIGINT) AS a,
         CAST(COUNT(*) FILTER (WHERE variant = 1) AS BIGINT) AS b
  FROM assign)
SELECT a AS n_control, b AS n_treatment,
       CAST(a - b AS BIGINT) AS diff,
       ROUND((a - b) * (a - b) * 1.0 / (a + b), 6) AS chi2
FROM counts
"""


@register("q_events_srm", oracle=_SRM_ORACLE)
def q_events_srm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio mismatch for the 50/50 split behind q_events_abtest
    (variant = user_id parity): the χ² statistic for observed variant
    counts vs the expected even split. For a two-cell 50/50 design
    χ² = Σ(O−E)²/E collapses to (a−b)²/(a+b) — all exact ints except
    the single final division (rounded 6 dp). SRM is the guardrail
    every experimentation platform runs BEFORE reading treatment
    effects: a skewed split means broken assignment, not a real
    effect. One distinct + one count — fully partial-aggregable."""
    ev = load_table(spark, sf_dir, "events")
    assign = ev.select(
        "user_id", (F.col("user_id") % 2).alias("variant")
    ).distinct()
    counts = assign.agg(
        F.count_if(F.col("variant") == 0).alias("a"),
        F.count_if(F.col("variant") == 1).alias("b"),
    )
    return counts.select(
        F.col("a").alias("n_control"),
        F.col("b").alias("n_treatment"),
        (F.col("a") - F.col("b")).alias("diff"),
        F.round(
            (F.col("a") - F.col("b"))
            * (F.col("a") - F.col("b"))
            * F.lit(1.0)
            / (F.col("a") + F.col("b")),
            6,
        ).alias("chi2"),
    )


# The SAME SQL text runs on Spark SQL and DuckDB: the common-ANSI-subset
# entry path (a reference user who writes SQL, not DataFrames, can hand
# this engine the identical query string they run today).
_COMMON_SQL = """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
       CAST(MIN(l_orderkey) AS BIGINT) AS min_order,
       CAST(MAX(l_orderkey) AS BIGINT) AS max_order
FROM lineitem
WHERE l_shipdate >= DATE '1995-01-01'
  AND l_shipdate < DATE '1996-01-01'
GROUP BY l_returnflag
"""


@register("q_sql_common_dialect", oracle=_COMMON_SQL)
def q_sql_common_dialect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-SQL entry path: the registered oracle STRING ITSELF is
    executed by spark.sql() over a temp view — zero translation, one
    shared ANSI-subset text for both engines (exact-int aggregates,
    DATE literals, explicit CASTs; nothing dialect-specific). This is
    the API-surface guarantee that a SQL-first user of the reference
    can paste their query into this engine unchanged; every other
    query in the registry states the oracle separately because it
    exercises Spark-specific physical strategy, not because the SQL
    front door is missing."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem"
    )
    return spark.sql(_COMMON_SQL)
