"""Fifty-sixth extension batch: the composed training-data pipeline —
clean → dedup → pack in ONE declarative plan — and its stage funnel.

Lineage: q_clean_pipeline filters + exact-dedups the corpus;
q_pack_sequences chunks documents into fixed-token training sequences.
A real 100 TB curation job runs them as one program: sequences must be
packed over the SURVIVING documents, not the raw corpus, or the
dataloader reads filtered/duplicate text. Composing them in a single
DataFrame expression lets Catalyst fuse every filter into the scan and
keep exactly two shuffles (the dedup groupBy and the per-source pack
window) — the whole-pipeline plan a driver-of-jobs orchestration would
need N materializations for. The funnel query is the job's ops
dashboard: how many documents each stage dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.textfns import TOKS_SQL, sql_list, tokens_col
from ..operators.text import _ALL_STOPWORDS
from ..registry import register
from .relational_ext28 import _SEQ_BUDGET

_CLEAN_CTES = f"""
t AS (
  SELECT doc_id, text, lang, source, {TOKS_SQL} AS toks FROM documents),
m AS (
  SELECT doc_id, text, lang, source,
         CAST(len(toks) AS BIGINT) AS n_tok,
         len(list_filter(toks,
             x -> list_contains({sql_list(_ALL_STOPWORDS)}, x))) AS n_stop
  FROM t),
kept AS (
  SELECT * FROM m
  WHERE lang = 'en'
    AND n_tok BETWEEN 20 AND 400
    AND n_stop * 1.0 / n_tok >= 0.05),
dedup AS (
  SELECT text, MIN(doc_id) AS keep_doc_id FROM kept GROUP BY text),
surviving AS (
  SELECT k.doc_id, k.source, k.n_tok
  FROM kept k JOIN dedup d ON k.doc_id = d.keep_doc_id)
"""


def _surviving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, n_tok) for documents surviving the C4-style
    clean + exact-dedup-keep-min stages (q_clean_pipeline semantics)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_col()
    stop_lits = F.array(*[F.lit(w) for w in _ALL_STOPWORDS])
    m = docs.select(
        "doc_id",
        "text",
        "source",
        "lang",
        F.size(toks).cast("long").alias("n_tok"),
        F.size(
            F.filter(toks, lambda x: F.array_contains(stop_lits, x))
        ).alias("n_stop"),
    )
    kept = m.filter(
        (F.col("lang") == "en")
        & F.col("n_tok").between(20, 400)
        & (F.col("n_stop") * 1.0 / F.col("n_tok") >= 0.05)
    )
    dedup = kept.groupBy("text").agg(F.min("doc_id").alias("keep_doc_id"))
    return kept.join(
        dedup, kept.doc_id == dedup.keep_doc_id, "left_semi"
    ).select("doc_id", "source", "n_tok")


@register(
    "q_train_data_pipeline",
    oracle=f"""
WITH {_CLEAN_CTES},
o AS (
  SELECT doc_id, source, n_tok,
         SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) - n_tok AS off
  FROM surviving)
SELECT source, CAST(off // {_SEQ_BUDGET} AS BIGINT) AS seq_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc
FROM o GROUP BY source, off // {_SEQ_BUDGET}
""",
)
def q_train_data_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end curation job as one query: C4-style clean
    (language, token band, stopword floor) → exact-dedup keep-min →
    concat-and-chunk packing of the SURVIVORS into {_SEQ_BUDGET}-token
    training sequences per source shard. Output is the dataloader's
    packing manifest over the cleaned corpus — the artifact a training
    run actually consumes; packing the raw corpus and filtering later
    would leave holes in every sequence.

    Scale: filters fuse into the scan (no pass of their own); the plan
    holds exactly two shuffles — the dedup groupBy on text hash and the
    per-source pack window — versus the materialize-between-stages
    orchestration (3 full writes + reads) the same job costs when each
    stage is a separate driver-of-jobs step. Per-source packing keeps
    the prefix sum partition-parallel (q_pack_sequences' scale note).
    """
    surv = _surviving(spark, sf_dir)
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    o = surv.withColumn("off", F.sum("n_tok").over(w) - F.col("n_tok"))
    return o.groupBy(
        "source", (F.col("off") / _SEQ_BUDGET).cast("long").alias("seq_id")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
        F.min("doc_id").alias("first_doc"),
    )


@register(
    "q_train_pipeline_funnel",
    oracle=f"""
WITH {_CLEAN_CTES},
o AS (
  SELECT source, n_tok,
         (SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                           ROWS UNBOUNDED PRECEDING) - n_tok)
           // {_SEQ_BUDGET} AS seq_id
  FROM surviving),
seqs AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_sequences
  FROM (SELECT DISTINCT source, seq_id FROM o))
SELECT
  (SELECT CAST(COUNT(*) AS BIGINT) FROM m) AS n_raw,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM m WHERE lang = 'en') AS n_lang,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM m
   WHERE lang = 'en' AND n_tok BETWEEN 20 AND 400) AS n_band,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM kept) AS n_quality,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM surviving) AS n_dedup,
  (SELECT CAST(SUM(n_tok) AS BIGINT) FROM surviving) AS total_tokens,
  (SELECT CAST(n_sequences AS BIGINT) FROM seqs) AS n_sequences
""",
)
def q_train_pipeline_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation job's funnel: documents remaining after each stage
    (raw → language → token band → stopword quality → dedup), plus the
    surviving token mass and the packed sequence count — the one-row
    ops dashboard that explains WHERE the corpus shrank (the number
    every curation postmortem starts from).

    Scale: stage counts are conditional aggregates over one scan
    (count-if, partial-aggregable); only the dedup count needs the
    groupBy shuffle the pipeline pays anyway, and the sequence count
    reuses the pack window over the already-reduced survivor set.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_col()
    stop_lits = F.array(*[F.lit(w) for w in _ALL_STOPWORDS])
    m = docs.select(
        "doc_id",
        "text",
        "source",
        "lang",
        F.size(toks).cast("long").alias("n_tok"),
        F.size(
            F.filter(toks, lambda x: F.array_contains(stop_lits, x))
        ).alias("n_stop"),
    )
    is_lang = F.col("lang") == "en"
    is_band = is_lang & F.col("n_tok").between(20, 400)
    is_kept = is_band & (
        F.col("n_stop") * 1.0 / F.col("n_tok") >= 0.05
    )
    stages = m.agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.sum(is_lang.cast("long")).alias("n_lang"),
        F.sum(is_band.cast("long")).alias("n_band"),
        F.sum(is_kept.cast("long")).alias("n_quality"),
    )
    surv = _surviving(spark, sf_dir)
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    o = surv.withColumn("off", F.sum("n_tok").over(w) - F.col("n_tok"))
    packed = o.select(
        "n_tok", F.struct("source", (F.col("off") / _SEQ_BUDGET).cast("long")).alias("sq")
    ).agg(
        F.count(F.lit(1)).alias("n_dedup"),
        F.sum("n_tok").alias("total_tokens"),
        F.countDistinct("sq").alias("n_sequences"),
    )
    return stages.crossJoin(F.broadcast(packed))
