"""Nineteenth extension batch: per-vector statistics via sequential
higher-order folds, binary-payload dedup, A/B-test evaluation, and a
Zipf-law corpus statistic.

Float-determinism notes: q_vector_stats relies on BOTH engines folding
the array sequentially left-to-right (Spark's aggregate() lambda and
DuckDB's list_sum over the same list) — identical operand order means
identical doubles, no rounding. q_events_abtest reduces to exact integer
counts before one closed-form z-score (identical expression tree).
q_text_zipf is the one place logs enter: ln() values are summed across
partitions in engine-specific order, so the regression coefficients are
rounded at 6dp (drift ~1e-13, boundary chance negligible)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.textfns import TOKS_SQL, tokens_col
from ..registry import register
from .triple import E_CTE

_VSTATS_ORACLE = """
WITH d AS (
  SELECT vec_id, label,
         [CAST(x AS DOUBLE) for x in embedding] AS v
  FROM embeddings)
SELECT vec_id, label,
       CAST(len(v) AS BIGINT) AS dim,
       list_sum(v) AS vsum,
       list_sum([x * x for x in v]) AS norm2,
       list_min(v) AS vmin,
       list_max(v) AS vmax,
       list_sum(v) / len(v) AS vmean
FROM d
"""


@register("q_vector_stats", oracle=_VSTATS_ORACLE)
def q_vector_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector summary statistics computed with higher-order array
    folds (aggregate/transform — JVM-evaluated, no Python): sum, squared
    norm, min, max, mean per embedding. EXACT float oracle, no rounding:
    both engines fold the same 64 doubles in the same left-to-right
    order, so every IEEE result is bit-identical (module header). This
    is the norm/moment pass an embedding-quality monitor runs; it
    touches each vector once, embarrassingly parallel, no shuffle at
    all (narrow projection of the scan)."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    zero = F.lit(0.0)
    return emb.select(
        "vec_id",
        "label",
        F.size("embedding").cast("long").alias("dim"),
        F.aggregate(v, zero, lambda a, x: a + x).alias("vsum"),
        F.aggregate(v, zero, lambda a, x: a + x * x).alias("norm2"),
        F.array_min(v).alias("vmin"),
        F.array_max(v).alias("vmax"),
        (
            F.aggregate(v, zero, lambda a, x: a + x)
            / F.size("embedding")
        ).alias("vmean"),
    )


@register(
    "q_dedup_binary",
    oracle="""
SELECT md5(text) AS payload_md5,
       CAST(COUNT(*) AS BIGINT) AS n_copies,
       CAST(MIN(doc_id) AS BIGINT) AS keeper_doc_id
FROM documents GROUP BY md5(text)
""",
)
def q_dedup_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on OPAQUE BINARY payloads: hash the bytes (not the
    text — works identically for images/audio where no text exists),
    keep the smallest doc_id per digest. The multimodal twin of
    q_dedup_exact: at 100 TB you dedup a media corpus by digest
    without ever decoding, and the shuffle carries 16-byte digests
    instead of payloads. Oracle hashes the text directly (identical
    bytes: UTF-8 encode of ASCII text)."""
    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        "doc_id", F.md5(F.encode("text", "UTF-8")).alias("payload_md5")
    )
    return media.groupBy("payload_md5").agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.min("doc_id").alias("keeper_doc_id"),
    )


_ABTEST_ORACLE = f"""
{E_CTE},
u AS (
  SELECT user_id % 2 AS variant,
         CAST(MAX(CASE WHEN event_type = 'purchase' AND value > 250
                  THEN 1 ELSE 0 END) AS BIGINT) AS converted
  FROM e GROUP BY user_id),
s AS (
  SELECT CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS n0,
         CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS n1,
         CAST(SUM(CASE WHEN variant = 0 THEN converted ELSE 0 END)
              AS DOUBLE) AS c0,
         CAST(SUM(CASE WHEN variant = 1 THEN converted ELSE 0 END)
              AS DOUBLE) AS c1
  FROM u)
SELECT CAST(n0 AS BIGINT) AS n_control,
       CAST(n1 AS BIGINT) AS n_treatment,
       c0 / n0 AS conv_control,
       c1 / n1 AS conv_treatment,
       (c1 / n1 - c0 / n0)
         / sqrt(((c0 + c1) / (n0 + n1)) * (1 - (c0 + c1) / (n0 + n1))
                * (1 / n0 + 1 / n1)) AS z_score
FROM s
"""


@register("q_events_abtest", oracle=_ABTEST_ORACLE)
def q_events_abtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test on a deterministic user split (user_id
    parity as the variant assignment): per-user conversion = made a
    high-value purchase (value > 250 — probed non-degenerate at every
    tier; an always-true predicate makes pooled·(1−pooled) = 0 and the
    z-score divide by zero, found live at sf0.001), then the pooled
    z-score from four exact integer counts —
    the experiment-evaluation primitive, expressed as two
    partial-aggregable groupBys and one closed form on the final row
    (identical expression tree both engines → bit-identical doubles,
    no rounding). At 100 TB the per-user reduction is the only real
    work; the z-score is driver-trivial."""
    ev = load_table(spark, sf_dir, "events")
    u = (
        ev.groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") > 250),
                    1,
                ).otherwise(0)
            ).alias("converted")
        )
        .select((F.col("user_id") % 2).alias("variant"), "converted")
    )
    s = u.agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0))
        .cast("double")
        .alias("n0"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0))
        .cast("double")
        .alias("n1"),
        F.sum(F.when(F.col("variant") == 0, F.col("converted")).otherwise(0))
        .cast("double")
        .alias("c0"),
        F.sum(F.when(F.col("variant") == 1, F.col("converted")).otherwise(0))
        .cast("double")
        .alias("c1"),
    )
    n0, n1, c0, c1 = F.col("n0"), F.col("n1"), F.col("c0"), F.col("c1")
    pooled = (c0 + c1) / (n0 + n1)
    return s.select(
        n0.cast("long").alias("n_control"),
        n1.cast("long").alias("n_treatment"),
        (c0 / n0).alias("conv_control"),
        (c1 / n1).alias("conv_treatment"),
        (
            (c1 / n1 - c0 / n0)
            / F.sqrt(pooled * (1 - pooled) * (1 / n0 + 1 / n1))
        ).alias("z_score"),
    )


_ZIPF_ORACLE = f"""
WITH toks AS (SELECT doc_id, {TOKS_SQL} AS t FROM documents),
tok AS (SELECT unnest(t) AS token FROM toks),
cnt AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY token),
ranked AS (
  SELECT token, n,
         row_number() OVER (ORDER BY n DESC, token) AS r
  FROM cnt),
top AS (SELECT * FROM ranked WHERE r <= 200),
s AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS m,
         SUM(ln(r)) AS sx, SUM(ln(n)) AS sy,
         SUM(ln(r) * ln(n)) AS sxy, SUM(ln(r) * ln(r)) AS sxx
  FROM top)
SELECT CAST(m AS BIGINT) AS n_points,
       ROUND((m*sxy - sx*sy) / (m*sxx - sx*sx), 6) AS zipf_slope,
       ROUND((sy - ((m*sxy - sx*sy) / (m*sxx - sx*sx)) * sx) / m, 6)
         AS zipf_intercept
FROM s
"""


@register("q_text_zipf", oracle=_ZIPF_ORACLE)
def q_text_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit over the corpus: regress ln(frequency) on ln(rank)
    for the top-200 tokens — the slope (~-1 for natural language) is a
    one-number corpus-health check (synthetic or templated text shows
    up as a wrong slope). Counts and ranks are exact ints with a token
    tiebreak; only the ln-sums are float-accumulated, so the two
    regression coefficients round at 6dp (module header). The global
    top-200 uses TakeOrdered (heap, no full sort shuffle)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(tokens_col()).alias("token"))
    cnt = tok.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    # heap-select the top 200 FIRST (TakeOrdered, per-partition heaps)
    # so the rank window runs over a 200-row frame, never the full
    # vocabulary — ranking-then-filtering was a data-scale global
    # window hiding behind the k filter
    head = cnt.orderBy(F.desc("n"), F.asc("token")).limit(200)
    ranked = head.withColumn(
        "r", F.row_number().over(Window.orderBy(F.desc("n"), F.asc("token")))
    )
    lx, ly = F.log(F.col("r").cast("double")), F.log(F.col("n").cast("double"))
    s = ranked.agg(
        F.count(F.lit(1)).cast("double").alias("m"),
        F.sum(lx).alias("sx"),
        F.sum(ly).alias("sy"),
        F.sum(lx * ly).alias("sxy"),
        F.sum(lx * lx).alias("sxx"),
    )
    m, sx, sy = F.col("m"), F.col("sx"), F.col("sy")
    sxy, sxx = F.col("sxy"), F.col("sxx")
    slope = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    return s.select(
        m.cast("long").alias("n_points"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round((sy - slope * sx) / m, 6).alias("zipf_intercept"),
    )
