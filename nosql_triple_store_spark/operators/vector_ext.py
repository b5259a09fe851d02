"""Vector/feature-engineering aggregates: centroid construction (the
training half of IVF) and quantile binning (equi-depth bucketing)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_vector_centroids",
    # centroid components cluster near 0 (zero-mean embeddings), so fine
    # rounding lands ON half-way boundaries where engine summation orders
    # disagree (observed at 4 dp); 2 dp keeps every boundary > 100x away
    # from the noise. `+ 0` canonicalizes -0.0 -> 0.0 in both engines.
    oracle="""
SELECT label, CAST(i - 1 AS INT) AS dim,
       ROUND(AVG(CAST(embedding[i] AS DOUBLE)), 2) + 0 AS centroid
FROM embeddings CROSS JOIN unnest(range(1, 65)) AS r(i)
GROUP BY label, i
""",
)
def q_vector_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroids in long format (label, dim, value): posexplode
    + partial-aggregable avg per (label, dim) — the coarse-quantizer
    training step q_vector_knn_ivf consumes, here oracle-checked."""
    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "dim", "x"
        ),
    )
    return dims.groupBy("label", "dim").agg(
        (F.round(F.avg("x"), 2) + F.lit(0.0)).alias("centroid")
    )


@register(
    "q_quantile_bins",
    oracle="""
WITH b AS (
  SELECT percentile_cont(0.25) WITHIN GROUP (ORDER BY o_totalprice) AS q1,
         percentile_cont(0.50) WITHIN GROUP (ORDER BY o_totalprice) AS q2,
         percentile_cont(0.75) WITHIN GROUP (ORDER BY o_totalprice) AS q3
  FROM orders)
SELECT CASE WHEN o_totalprice < b.q1 THEN 0
            WHEN o_totalprice < b.q2 THEN 1
            WHEN o_totalprice < b.q3 THEN 2
            ELSE 3 END AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(MIN(o_totalprice), 2) AS lo, ROUND(MAX(o_totalprice), 2) AS hi
FROM orders, b GROUP BY 1
""",
)
def q_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quantile) binning: exact quartile boundaries, then a
    broadcast of the 3 cut points assigns bins in one scan — the
    feature-engineering discretization that avoids a global sort (unlike
    ntile over a global ORDER BY). Boundary semantics pinned to
    left-closed (< q) in both engines; prices are continuous so no value
    sits exactly on a quartile."""
    orders = load_table(spark, sf_dir, "orders")
    b = orders.agg(
        F.percentile("o_totalprice", F.lit(0.25)).alias("q1"),
        F.percentile("o_totalprice", F.lit(0.50)).alias("q2"),
        F.percentile("o_totalprice", F.lit(0.75)).alias("q3"),
    )
    with_bin = orders.crossJoin(F.broadcast(b)).select(
        F.when(F.col("o_totalprice") < F.col("q1"), 0)
        .when(F.col("o_totalprice") < F.col("q2"), 1)
        .when(F.col("o_totalprice") < F.col("q3"), 2)
        .otherwise(3)
        .alias("bin"),
        "o_totalprice",
    )
    return with_bin.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.min("o_totalprice"), 2).alias("lo"),
        F.round(F.max("o_totalprice"), 2).alias("hi"),
    )
