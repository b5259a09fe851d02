"""Thirteenth extension batch: time-series gap fill, cumulative distinct
via first-occurrence, a Python UDTF (lateral table function), audio-style
binary chunking, and PII masking.

Lineage: north-star analytics + LLM-pipeline surface (SURVEY §2.C). The
gap-fill and cumulative-distinct shapes are the standard warehouse
patterns the reference cannot express at all (no window functions,
SURVEY §2.B); the UDTF covers the one remaining user-defined surface
(scalar UDF/pandas UDF/UDAF-by-agg/mapInPandas are elsewhere).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.textfns import TOKS_SQL
from ..registry import register
from .triple import E_CTE

_GAP_FILL_ORACLE = f"""
{E_CTE},
daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day, ROUND(SUM(value), 2) AS v
  FROM e GROUP BY 1, 2),
span AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
         FROM daily GROUP BY user_id),
spine AS (
  SELECT user_id,
         CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
  FROM span),
j AS (
  SELECT s.user_id, s.day, d.v
  FROM spine s LEFT JOIN daily d USING (user_id, day))
SELECT user_id, day,
       last_value(v IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY day
               ROWS UNBOUNDED PRECEDING) AS v_filled,
       CAST(v IS NOT NULL AS BIGINT) AS observed
FROM j
"""


@register("q_gap_fill", oracle=_GAP_FILL_ORACLE)
def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill gap filling: per-user daily totals are exploded onto
    a dense per-user date spine (sequence + explode between each user's
    first and last active day), missing days carry the last observed
    value via last(..., ignorenulls) over an ordered frame. THE
    time-series regularization step before any resample/train split.
    Daily sums round once at the aggregate (2dp) BEFORE filling, so both
    engines copy identical doubles forward. No leading-null hazard: each
    spine starts at the user's first observed day. Scale: the spine join
    and the fill window share the user_id partitioning — one shuffle;
    row expansion is bounded by span-days × users, never events."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.col("ts").cast("date").alias("day")
    ).agg(F.round(F.sum("value"), 2).alias("v"))
    span = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = span.select(
        "user_id", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    j = spine.join(daily, ["user_id", "day"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "user_id",
        "day",
        F.last("v", ignorenulls=True).over(w).alias("v_filled"),
        F.col("v").isNotNull().cast("long").alias("observed"),
    )


_CUMDIST_ORACLE = """
WITH firstm AS (
  SELECT o_custkey,
         MIN(CAST(date_trunc('month', o_orderdate) AS DATE)) AS month
  FROM orders GROUP BY o_custkey),
monthly AS (
  SELECT month, CAST(COUNT(*) AS BIGINT) AS n_new
  FROM firstm GROUP BY month)
SELECT month, n_new,
       CAST(SUM(n_new) OVER (ORDER BY month ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS cum_distinct
FROM monthly
"""


@register("q_window_count_distinct", oracle=_CUMDIST_ORACLE)
def q_window_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative DISTINCT customers per month — COUNT(DISTINCT) OVER is
    unsupported as a window in both Spark and DuckDB, so the standard
    rewrite: attribute each customer to their FIRST month (min-aggregate,
    partial-aggregable), count news per month, running-sum the counts.
    Same trick both engines, exact ints throughout. The global ordered
    window runs over ~tens of month rows (post-aggregate), not raw
    orders — at 100 TB swap it for the bucketed prefix-sum only if the
    grouping key cardinality itself explodes."""
    orders = load_table(spark, sf_dir, "orders")
    firstm = orders.groupBy("o_custkey").agg(
        F.min(F.date_trunc("month", "o_orderdate").cast("date")).alias("month")
    )
    monthly = firstm.groupBy("month").agg(F.count(F.lit(1)).alias("n_new"))
    w = Window.orderBy("month").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return monthly.select(
        "month", "n_new", F.sum("n_new").over(w).alias("cum_distinct")
    )


_UDTF_ORACLE = f"""
WITH sub AS (SELECT doc_id, {TOKS_SQL} AS t FROM documents
             WHERE doc_id % 5 = 0),
g AS (
  SELECT doc_id,
         CAST(i - 1 AS BIGINT) AS pos,
         t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS ngram
  FROM sub, LATERAL UNNEST(generate_series(1, len(t) - 2)) AS u(i)
  WHERE len(t) >= 3)
SELECT doc_id, pos, ngram FROM g
"""


@register("q_udtf_ngrams", oracle=_UDTF_ORACLE)
def q_udtf_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (user-defined TABLE function) surface: a lateral
    trigram expander — one input row fans out to (pos, ngram) rows. The
    tokenizer is the byte-identical Python twin of functions.textfns
    (lower, split on single space, drop empties). Registered per-call
    under a fixed name and applied with SQL LATERAL.

    The UDTF class is closure-local so cloudpickle ships it BY VALUE
    (same lesson as streaming/transform_state: never depend on module
    resolution in a worker). Row-at-a-time Python is the SLOW path —
    the production trigram queries here use JVM-side explode
    (q_text_bigram_novelty et al.); this query exists to cover the UDTF
    API on a bounded subset (doc_id % 5 = 0, ~20% of docs)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos bigint, ngram string")
    class TriGrams:
        def eval(self, text: str):
            toks = [t for t in (text or "").lower().split(" ") if t != ""]
            for i in range(len(toks) - 2):
                yield i, " ".join(toks[i : i + 3])

    spark.udtf.register("nts_trigrams", TriGrams)
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 5 == 0
    )
    return spark.sql(
        "SELECT d.doc_id, t.pos, t.ngram "
        "FROM {d} d, LATERAL nts_trigrams(d.text) t",
        d=docs,
    )


_CHUNK = 256
_HOP = 128

_AUDIO_ORACLE = f"""
WITH wav AS (
  SELECT doc_id, text, CAST(octet_length(encode(text)) AS BIGINT) AS blen
  FROM documents WHERE doc_id % 3 = 2),
offs AS (
  SELECT doc_id, text, blen,
         CAST(unnest(generate_series(0, blen - 1, {_HOP})) AS BIGINT) AS off
  FROM wav)
SELECT doc_id,
       CAST(off / {_HOP} AS BIGINT) AS chunk_idx,
       off AS chunk_off,
       CAST(LEAST({_CHUNK}, blen - off) AS BIGINT) AS chunk_len,
       md5(substring(text, CAST(off + 1 AS BIGINT), {_CHUNK})) AS chunk_md5
FROM offs
"""


def _chunk_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: slice real bytes out of the Arrow binary
    column — the exact plumbing a PCM frame-splitter needs (decode
    itself is stubbed per multimodal.decode_media)."""
    import hashlib

    for pdf in batches:
        out = {
            "doc_id": [],
            "chunk_idx": [],
            "chunk_off": [],
            "chunk_len": [],
            "chunk_md5": [],
        }
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = bytes(payload)
            for idx, off in enumerate(range(0, len(b), _HOP)):
                chunk = b[off : off + _CHUNK]
                out["doc_id"].append(doc_id)
                out["chunk_idx"].append(idx)
                out["chunk_off"].append(off)
                out["chunk_len"].append(len(chunk))
                out["chunk_md5"].append(hashlib.md5(chunk).hexdigest())
        yield pd.DataFrame(out)


@register("q_multimodal_audio_chunks", oracle=_AUDIO_ORACLE)
def q_multimodal_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-style chunking of opaque binary payloads: the 'wav' cohort
    (doc_id % 3 = 2, matching q_multimodal_meta's format tagging) is
    split into overlapping {_CHUNK}-byte windows with a {_HOP}-byte hop —
    the frame layout a feature extractor (MFCC/fbank) consumes. Bytes
    ride Arrow buffers through mapInPandas; slicing happens on real
    bytes. The oracle mirrors the slices with VARCHAR substring — valid
    because the fixture text is pure ASCII (byte == char offsets;
    asserted in tests/test_ext13.py), so md5(string slice) ==
    md5(byte slice). Row expansion happens AFTER the cohort filter."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 3 == 2
    )
    media = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return media.mapInPandas(
        _chunk_kernel,
        schema=(
            "doc_id long, chunk_idx long, chunk_off long, "
            "chunk_len long, chunk_md5 string"
        ),
    )


_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\+1-555-[0-9]{4}"

_PII_ORACLE = f"""
WITH aug AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or +1-555-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS raw
  FROM documents),
m AS (
  SELECT doc_id, raw,
         regexp_replace(regexp_replace(raw, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                        '{_PHONE_RE}', '<PHONE>', 'g') AS masked
  FROM aug)
SELECT doc_id,
       CAST(len(regexp_extract_all(raw, '{_EMAIL_RE}')) AS BIGINT)
         AS n_emails,
       CAST(len(regexp_extract_all(raw, '{_PHONE_RE}')) AS BIGINT)
         AS n_phones,
       CAST(length(masked) AS BIGINT) AS masked_len,
       md5(masked) AS masked_md5
FROM m
"""


@register("q_text_pii_mask", oracle=_PII_ORACLE)
def q_text_pii_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII masking pass (training-data redaction): emails and phone-like
    tokens replaced with placeholder tags, plus per-doc match counts for
    audit. The fixture text contains no organic PII, so each doc is
    first augmented with a deterministic synthetic contact line (derived
    from doc_id — non-vacuous by construction: every doc has ≥1 email
    and ≥1 phone to find). Patterns stay in the Java∩RE2 common regex
    subset so Spark and DuckDB match identically; DuckDB needs the 'g'
    flag to mirror Spark's replace-all. Verified via masked md5 +
    lengths + counts."""
    docs = load_table(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("raw"),
    )
    m = aug.select(
        "doc_id",
        "raw",
        F.regexp_replace(
            F.regexp_replace("raw", _EMAIL_RE, "<EMAIL>"),
            _PHONE_RE,
            "<PHONE>",
        ).alias("masked"),
    )
    return m.select(
        "doc_id",
        F.regexp_count("raw", F.lit(_EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count("raw", F.lit(_PHONE_RE)).cast("long").alias("n_phones"),
        F.length("masked").cast("long").alias("masked_len"),
        F.md5(F.encode("masked", "UTF-8")).alias("masked_md5"),
    )
