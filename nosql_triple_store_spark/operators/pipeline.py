"""Composed corpus-cleaning pass (C4/RefinedWeb-style): the individual
text operators chained into the one pipeline a training-data run actually
executes — language filter, length band, stopword-density floor, exact
dedup keep-min — in a single declarative plan Catalyst optimizes as one
query (filters fused into the scan, one dedup shuffle).

Plus a trailing-window z-score anomaly detector over the event stream's
daily volumes — the ops-side monitor for ingest pipelines."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.textfns import TOKS_SQL, sql_list, tokens_col
from ..operators.text import _ALL_STOPWORDS
from ..registry import register
from .triple import E_CTE


@register(
    "q_clean_pipeline",
    oracle=f"""
WITH t AS (
  SELECT doc_id, text, lang, source, {TOKS_SQL} AS toks FROM documents),
m AS (
  SELECT doc_id, text, lang, source,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         len(list_filter(toks,
             x -> list_contains({sql_list(_ALL_STOPWORDS)}, x))) AS n_stop
  FROM t),
kept AS (
  SELECT * FROM m
  WHERE lang = 'en'
    AND n_tokens BETWEEN 20 AND 400
    AND n_stop * 1.0 / n_tokens >= 0.05),
dedup AS (
  SELECT text, MIN(doc_id) AS keep_doc_id FROM kept GROUP BY text)
SELECT k.doc_id, k.source, k.n_tokens
FROM kept k JOIN dedup d ON k.doc_id = d.keep_doc_id
""",
)
def q_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed cleaning pass: language = en, token count in
    [20, 400], stopword ratio >= 0.05 (a ratio of exact ints — no float
    boundary risk), then exact-dedup keeping the min doc_id per
    surviving text. All filters are one fused scan projection; the only
    shuffle is the dedup groupBy — at 100 TB the filters drop the bulk
    of the corpus BEFORE that shuffle, which is why the pipeline is
    ordered this way."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_col()
    stop_lits = F.array(*[F.lit(w) for w in _ALL_STOPWORDS])
    m = docs.select(
        "doc_id",
        "text",
        "lang",
        "source",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(
            F.filter(toks, lambda x: F.array_contains(stop_lits, x))
        ).alias("n_stop"),
    )
    kept = m.filter(
        (F.col("lang") == "en")
        & F.col("n_tokens").between(20, 400)
        & (F.col("n_stop") * 1.0 / F.col("n_tokens") >= 0.05)
    )
    dedup = kept.groupBy("text").agg(F.min("doc_id").alias("keep_doc_id"))
    return (
        kept.join(dedup, kept.doc_id == dedup.keep_doc_id, "left_semi")
        .select("doc_id", "source", "n_tokens")
    )


@register(
    "q_events_anomaly",
    oracle=f"""
{E_CTE},
daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM e GROUP BY 1, 2),
w AS (
  SELECT event_type, day, n,
         SUM(n) OVER tw AS s,
         SUM(n * n) OVER tw AS ss,
         COUNT(*) OVER tw AS k
  FROM daily
  WINDOW tw AS (PARTITION BY event_type ORDER BY day
                ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
SELECT event_type, day, n,
       ROUND((n - s * 1.0 / k)
             / sqrt(ss * 1.0 / k - (s * 1.0 / k) * (s * 1.0 / k)), 4)
         AS zscore
FROM w
WHERE k = 7 AND ss * 1.0 / k - (s * 1.0 / k) * (s * 1.0 / k) > 0
""",
)
def q_events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing z-score anomaly detection: each day's event count vs the
    mean/std of the PRECEDING 7 days (ROWS frame — never includes the
    current row, the standard leak-free monitor). Variance is computed
    from integer sums (n, n²) with the same explicit expression in both
    engines — built-in stddev implementations (Welford vs two-pass)
    disagree in ulps, so neither is used. The window input is the tiny
    daily aggregate, partitioned by event_type."""
    events = load_table(spark, sf_dir, "events")
    # ntz -> date -> ntz, not date_trunc: date_trunc would return a
    # session-TZ timestamp that shifts on non-UTC hosts (TZ probe)
    daily = events.groupBy(
        "event_type",
        F.col("ts").cast("date").cast("timestamp_ntz").alias("day"),
    ).agg(F.count(F.lit(1)).alias("n"))
    tw = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-7, -1)
    )
    w = daily.select(
        "event_type",
        "day",
        "n",
        F.sum("n").over(tw).alias("s"),
        F.sum(F.col("n") * F.col("n")).over(tw).alias("ss"),
        F.count(F.lit(1)).over(tw).alias("k"),
    )
    mean = F.col("s") * 1.0 / F.col("k")
    var = F.col("ss") * 1.0 / F.col("k") - mean * mean
    return (
        w.filter((F.col("k") == 7) & (var > 0))
        .select(
            "event_type",
            "day",
            "n",
            F.round((F.col("n") - mean) / F.sqrt(var), 4).alias("zscore"),
        )
    )
