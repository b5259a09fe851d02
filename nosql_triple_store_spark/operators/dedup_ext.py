"""Character n-gram near-dup detection — the character-level twin of
q_dedup_near's token-shingle Jaccard (robust to tokenization differences;
the standard plagiarism-detection representation).

Scale design: the inverted-index self-join is run over RARE grams only
(document frequency <= DF_CAP). This is both the correct scale mitigation
(hot grams like ' the ' dominate sum(df^2) join blowup — probed 15.6M
pair rows uncapped vs 29k capped at sf0.01) and a better similarity
signal (common grams carry no discriminative weight). The cap is part of
the operator's declared semantics, so the oracle encodes it too."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from ..widths import fanout_width
from ..materialize import materialize

DF_CAP = 20
_N = 5

_NGRAM_ORACLE = f"""
WITH sh AS (
  SELECT DISTINCT doc_id, substr(lower(text), i, {_N}) AS g
  FROM documents,
       LATERAL UNNEST(generate_series(1, GREATEST(length(text) - {_N - 1}, 0)))
         AS t(i)),
rare AS (
  SELECT g FROM sh GROUP BY g HAVING COUNT(*) <= {DF_CAP}),
rsh AS (SELECT doc_id, g FROM sh JOIN rare USING (g)),
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_g
          FROM rsh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(COUNT(*) AS BIGINT) AS common
  FROM rsh a JOIN rsh b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b, common,
       ROUND(common * 1.0 / (sa.n_g + sb.n_g - common), 4) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
ORDER BY common * 1.0 / (sa.n_g + sb.n_g - common) DESC, doc_a, doc_b
LIMIT 50
"""


@register("q_dedup_ngram", oracle=_NGRAM_ORACLE)
def q_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 near-dup pairs by rare character-5-gram Jaccard.

    Grams via JVM-side sequence+transform (interpreted per element but
    linear in corpus size — no Python round-trip); the df-cap is
    one small aggregate broadcast back onto the gram stream; the pair
    join is the same inverted-index shape as q_dedup_near. Jaccard is a
    ratio of exact ints so cross-engine ordering is bit-identical; the
    top-50 carries (doc_a, doc_b) tiebreaks."""
    docs = load_table(spark, sf_dir, "documents").repartition(
        fanout_width(spark)
    )
    grams = docs.select(
        "doc_id", F.lower("text").alias("__t")
    ).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(1),
                    F.greatest(F.length("__t") - (_N - 1), F.lit(0)),
                ),
                lambda i: F.col("__t").substr(i, F.lit(_N)),
            )
        ).alias("g"),
    ).distinct().transform(materialize)
    # ^ the gram stream (explode + distinct over every character) is the
    # expensive input and feeds BOTH the df-cap aggregate and the rare
    # re-join; materialize once instead of exploding the corpus twice
    rare = (
        grams.groupBy("g")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= DF_CAP)
        .select("g")
    )
    # rare-filtered stream feeds three consumers (sizes + both self-join
    # sides); after the df-cap it is the small end of the pipeline
    rsh = grams.join(F.broadcast(rare), "g").transform(materialize)
    sizes = rsh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_g"))
    a = rsh.select(F.col("doc_id").alias("doc_a"), "g")
    b = rsh.select(F.col("doc_id").alias("doc_b"), "g")
    common = (
        a.join(b, "g")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_g").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_g").alias("nb"))
    jac = F.col("common") * 1.0 / (F.col("na") + F.col("nb") - F.col("common"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a", "doc_b", "common",
            jac.alias("_jac"), F.round(jac, 4).alias("jaccard"),
        )
        .orderBy(F.desc("_jac"), "doc_a", "doc_b")
        .limit(50)
        .select("doc_a", "doc_b", "common", "jaccard")
    )
