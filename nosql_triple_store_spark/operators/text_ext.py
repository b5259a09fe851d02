"""Corpus-level text association mining.

Lineage: collocation extraction (PMI over token bigrams) is the classic
corpus-statistics pass a training-data pipeline runs to find multi-word
units and boilerplate phrases (Church & Hanks 1990); the reference's
dataset is RDF triples over YAGO entity names, where the same statistic
surfaces entity-name collocations. Complements q_text_bigram_novelty
(per-doc rarity score) with the corpus-wide association ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.textfns import TOKS_SQL, tokens_col
from ..registry import register

_PMI_MIN_COUNT = 5

_PMI_ORACLE = f"""
WITH toks AS (SELECT doc_id, {TOKS_SQL} AS t FROM documents),
uni AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w),
n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM uni),
bi AS (
  SELECT t[i] AS w1, t[i+1] AS w2
  FROM toks, LATERAL UNNEST(generate_series(1, len(t) - 1)) AS g(i)),
bic AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c_xy
  FROM bi GROUP BY w1, w2
  HAVING COUNT(*) >= {_PMI_MIN_COUNT})
SELECT w1, w2, c_xy, u1.c AS c_x, u2.c AS c_y,
       ROUND(c_xy * n.n * 1.0 / (u1.c * u2.c), 4) AS pmi_ratio
FROM bic
JOIN uni u1 ON bic.w1 = u1.w
JOIN uni u2 ON bic.w2 = u2.w
CROSS JOIN n
ORDER BY c_xy * n.n * 1.0 / (u1.c * u2.c) DESC, w1, w2
LIMIT 50
"""


@register("q_text_pmi", oracle=_PMI_ORACLE)
def q_text_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: top-50 token bigrams by pointwise mutual
    information, min support 5. The score is the PMI *ratio*
    c_xy·N / (c_x·c_y) — exp(PMI) — not its log: numerator and
    denominator are exact ints < 2^53 and one IEEE double division is
    correctly rounded, so ranking and the 4-dp rounded score are
    bit-identical cross-engine with no transcendental in sight (log is
    monotone, so the ranking IS the PMI ranking). Three shuffles, all
    partial-aggregable (unigram count, bigram count, final top-k heap
    merge); the corpus token total N is a broadcast 1-row aggregate.
    At 100 TB the unigram and bigram tables shuffle on word keys —
    Zipf skew on stopword-headed bigrams is bounded because counts are
    pre-aggregated map-side before either join."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens_col().alias("t"))
    uni = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    total = uni.agg(F.sum("c").alias("n"))
    bi = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(size(t) - 1, 0)),"
                " i -> struct(t[i-1] AS w1, t[i] AS w2))"
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    bic = (
        bi.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .filter(F.col("c_xy") >= _PMI_MIN_COUNT)
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c_x"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c_y"))
    ratio = (
        F.col("c_xy") * F.col("n") * F.lit(1.0) / (F.col("c_x") * F.col("c_y"))
    )
    return (
        bic.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "w1", "w2", "c_xy", "c_x", "c_y",
            ratio.alias("_r"),
            F.round(ratio, 4).alias("pmi_ratio"),
        )
        .orderBy(F.desc("_r"), F.asc("w1"), F.asc("w2"))
        .limit(50)
        .select("w1", "w2", "c_xy", "c_x", "c_y", "pmi_ratio")
    )
