"""Thirty-seventh extension batch: Benford first-digit conformance and
embedding-distribution drift.

Lineage: two monitoring gates. Benford's law is the standard
anomaly/fraud screen over financial magnitude columns (does the
first-significant-digit histogram follow log10(1+1/d)?); centroid
drift between two population slices is the embedding-space analog of
q_drift_psi's token-distribution check — the guardrail a retrieval /
training pipeline watches when a new encoder or corpus wave lands.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

# Benford expectation in exact ppm, precomputed once in Python and
# embedded as integer literals in BOTH engines' plans (log10 is
# irrational; shipping the rounded constant sidesteps any libm
# last-ulp disagreement).
_BENFORD_PPM = {
    d: int(round(math.log10(1 + 1 / d) * 1_000_000)) for d in range(1, 10)
}
_BENFORD_CASE_SQL = (
    "CASE digit "
    + " ".join(f"WHEN {d} THEN {p}" for d, p in _BENFORD_PPM.items())
    + " END"
)


@register(
    "q_agg_benford",
    oracle=f"""
WITH c AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
d AS (
  SELECT CAST(SUBSTR(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM c),
n AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY 1),
t AS (SELECT SUM(n) AS total FROM n)
SELECT digit, n,
       CAST(n * 1000000 // total AS BIGINT) AS obs_ppm,
       CAST({_BENFORD_CASE_SQL} AS BIGINT) AS exp_ppm
FROM n, t
""",
)
def q_agg_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit census over order totals: observed vs
    expected (log10(1+1/d)) share per leading digit, in exact ppm
    integers — the fraud/anomaly screen for magnitude columns. The
    leading digit is extracted from the INTEGER cents string (never
    via float log10, whose last-ulp behavior at powers of ten differs
    between libms); the Benford constants are precomputed in Python
    and embedded as identical literals in both engines.

    Scale: one scan, one 9-group hash aggregation, one broadcast
    total. TPC-H prices are uniform-ish so the observed shares WON'T
    match Benford — the query reports the divergence; conformance
    testing is the consumer's join away.
    """
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    d = orders.select(
        F.substring(cents.cast("string"), 1, 1).cast("long").alias("digit")
    )
    n = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    t = n.agg(F.sum("n").alias("total"))
    exp_col = F.lit(None).cast("long")
    for dig, ppm in _BENFORD_PPM.items():
        exp_col = F.when(F.col("digit") == dig, F.lit(ppm)).otherwise(exp_col)
    return n.crossJoin(F.broadcast(t)).select(
        "digit",
        "n",
        F.expr("CAST(n * 1000000 div total AS BIGINT)").alias("obs_ppm"),
        exp_col.alias("exp_ppm"),
    )


_DIM = 64


@register(
    "q_vector_drift",
    oracle=f"""
WITH x AS (
  SELECT vec_id % 2 AS g, i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS v
  FROM embeddings CROSS JOIN unnest(range(1, {_DIM + 1})) AS r(i)),
c AS (SELECT g, dim, AVG(v) AS c FROM x GROUP BY 1, 2),
j AS (
  SELECT a.c AS ca, b.c AS cb
  FROM c a JOIN c b USING (dim) WHERE a.g = 0 AND b.g = 1),
s AS (
  SELECT SUM(ca * cb) AS dot, SQRT(SUM(ca * ca)) AS na,
         SQRT(SUM(cb * cb)) AS nb, SQRT(SUM((ca - cb) * (ca - cb))) AS l2
  FROM j),
n AS (
  SELECT CAST(SUM(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_a,
         CAST(SUM(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_b
  FROM embeddings)
SELECT n_a, n_b,
       ROUND(dot / (na * nb), 4) + 0 AS cos_centroid,
       ROUND(na, 4) + 0 AS norm_a, ROUND(nb, 4) + 0 AS norm_b,
       ROUND(l2, 4) + 0 AS l2_centroid
FROM s, n
""",
)
def q_vector_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-distribution drift between two population slices
    (vec_id parity stands in for before/after corpus waves): centroid
    cosine, centroid L2 gap, and per-slice centroid norms. Random
    zero-mean slices of one population give cos near 1 between small
    centroids; a real encoder/corpus shift drags cos down and l2 up —
    the embedding analog of q_drift_psi. Rounded at 4 dp with -0.0
    canonicalized (vector_ext.py convention) so cross-engine float
    summation order stays far below the comparison grain.

    Scale: posexplode + one partial-aggregable avg per (slice, dim) —
    the corpus is reduced to 2x{_DIM} centroid cells before any join;
    the combine stage touches {_DIM} rows. Same sufficient-statistic
    shape as the scatter-matrix PCA (vector_ext 'one-pass' family).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    x = emb.select(
        (F.col("vec_id") % 2).alias("g"),
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "dim", "v"
        ),
    )
    c = x.groupBy("g", "dim").agg(F.avg("v").alias("c"))
    a = c.filter(F.col("g") == 0).select("dim", F.col("c").alias("ca"))
    b = c.filter(F.col("g") == 1).select("dim", F.col("c").alias("cb"))
    j = a.join(b, "dim")
    s = j.agg(
        F.sum(F.col("ca") * F.col("cb")).alias("dot"),
        F.sqrt(F.sum(F.col("ca") * F.col("ca"))).alias("na"),
        F.sqrt(F.sum(F.col("cb") * F.col("cb"))).alias("nb"),
        F.sqrt(
            F.sum((F.col("ca") - F.col("cb")) * (F.col("ca") - F.col("cb")))
        ).alias("l2"),
    )
    n = emb.agg(
        F.sum(F.when(F.col("vec_id") % 2 == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("vec_id") % 2 == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
    )
    return s.crossJoin(F.broadcast(n)).select(
        "n_a",
        "n_b",
        (F.round(F.col("dot") / (F.col("na") * F.col("nb")), 4) + F.lit(0.0))
        .alias("cos_centroid"),
        (F.round("na", 4) + F.lit(0.0)).alias("norm_a"),
        (F.round("nb", 4) + F.lit(0.0)).alias("norm_b"),
        (F.round("l2", 4) + F.lit(0.0)).alias("l2_centroid"),
    )
