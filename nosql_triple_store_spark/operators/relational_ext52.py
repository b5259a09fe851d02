"""Fifty-second extension batch: alarm debouncing and the cross-source
near-duplication matrix.

Lineage: the debounce turns q_events_anomaly_seasonal's per-day flags
into PAGES (raise only on the second consecutive anomalous day — the
hysteresis every on-call rotation demands of a 3-MAD gate), and the
source matrix turns the near-dup pair stream into the curation
diagnostic "which sources copy from each other" — the corpus-level
view of the same verified LSH edges q_dedup_pipeline clusters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.textfns import TOKS_SQL, shingles_sql
from ..registry import register
from .dedup_pipeline import THRESHOLD, verified_edges_scratch
from .relational_ext50 import _MA_HALF, _MAD_K
from .triple import E_CTE


@register(
    "q_events_alarm_debounce",
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
med AS (SELECT percentile_cont(0.5) WITHIN GROUP (ORDER BY resid) AS m
        FROM res),
mad AS (SELECT percentile_cont(0.5)
               WITHIN GROUP (ORDER BY ABS(resid - med.m)) AS mad
        FROM res, med),
fl AS (
  SELECT r.day,
         (ABS(r.resid - med.m) > {_MAD_K} * mad.mad) AS flag
  FROM res r, med, mad)
SELECT day, flag AS is_anomaly,
       (flag AND COALESCE(LAG(flag) OVER (ORDER BY day), FALSE))
         AS alarm
FROM fl
""",
)
def q_events_alarm_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debounced alerting over the seasonal anomaly gate: a page
    (alarm=true) fires only when TODAY and YESTERDAY both breached the
    {_MAD_K}-MAD residual gate — single-day spikes are noise, two
    consecutive days are an incident. The lag window runs over the
    daily aggregate (bounded); flags chain the exact decomposition +
    robust-gate machinery of q_events_anomaly_seasonal.

    Scale: identical to the parent query plus one lag over |days|
    rows. At stream time the same two-day conjunction is one
    applyInPandasWithState cell per series (q_stream_lww_state's
    shape).
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
    mad = res.crossJoin(F.broadcast(med)).agg(
        F.percentile(F.abs(F.col("resid") - F.col("m")), F.lit(0.5)).alias(
            "mad"
        )
    )
    fl = (
        res.crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(mad))
        .select(
            "day",
            (
                F.abs(F.col("resid") - F.col("m"))
                > _MAD_K * F.col("mad")
            ).alias("flag"),
        )
    )
    lw = Window.orderBy("day")
    return fl.select(
        "day",
        F.col("flag").alias("is_anomaly"),
        (
            F.col("flag")
            & F.coalesce(F.lag("flag").over(lw), F.lit(False))
        ).alias("alarm"),
    )


@register(
    "q_dedup_source_matrix",
    oracle=f"""
WITH toks AS (SELECT doc_id, {TOKS_SQL} AS t FROM documents),
sh AS (SELECT doc_id, unnest({shingles_sql("t")}) AS shingle FROM toks),
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh
          FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(COUNT(*) AS BIGINT) AS common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
pairs AS (
  SELECT doc_a, doc_b FROM common
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE common * 1.0 / (sa.n_sh + sb.n_sh - common) >= {THRESHOLD}),
src AS (SELECT doc_id, source FROM documents),
m AS (
  SELECT LEAST(a.source, b.source) AS source_a,
         GREATEST(a.source, b.source) AS source_b,
         CAST(COUNT(*) AS BIGINT) AS n_pairs
  FROM pairs p
  JOIN src a ON a.doc_id = p.doc_a
  JOIN src b ON b.doc_id = p.doc_b
  GROUP BY 1, 2)
SELECT source_a, source_b, n_pairs,
       (source_a = source_b) AS within_source
FROM m
""",
)
def q_dedup_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source near-duplication matrix: the verified near-dup pair
    stream (MinHash-LSH candidates → exact Jaccard >= {THRESHOLD},
    exactly q_dedup_pipeline's edge stage, reusing the stored band
    index) aggregated by unordered SOURCE pair — the curation
    diagnostic that shows which feeds mirror each other and how much
    of a source is self-duplicated. The oracle recomputes pairs
    exactly, so the LSH candidate recall at the threshold is re-proven
    here on a different aggregation.

    Scale: everything heavy is shared scratch (shingle stream, band
    index — built once per process); the new work is a broadcast
    doc→source join over the pair stream plus a |sources|²-bounded
    aggregate.
    """
    edges = verified_edges_scratch(spark, sf_dir)
    src = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source"
    )
    a = src.select(
        F.col("doc_id").alias("src_"), F.col("source").alias("sa")
    )
    b = src.select(
        F.col("doc_id").alias("dst_"), F.col("source").alias("sb")
    )
    m = (
        edges.join(F.broadcast(a), edges.src == a.src_)
        .join(F.broadcast(b), edges.dst == b.dst_)
        .groupBy(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
    return m.select(
        "source_a",
        "source_b",
        "n_pairs",
        (F.col("source_a") == F.col("source_b")).alias("within_source"),
    )
