"""Distributed k-means (Lloyd) over the embeddings table — the
clustering pass behind IVF index building (q_vector_knn_ivf probes
label cells; a real IVF trains its cells with exactly this loop),
corpus topic bucketing, and semantic-dedup blocking.

Spark shape per iteration: centroids are a k x dim literal broadcast to
executors (k*dim doubles — driver traffic is O(k*dim), never O(n));
assignment is a broadcast nested-loop over the k candidates folded with
JVM higher-order functions (no Python in the row path); the update step
is ONE partial-aggregable groupBy over exploded (cluster, dim) cells.
Iterative float fixpoint -> rows-only check (like q_graph_pagerank);
tests/test_ext26.py asserts the Lloyd invariants instead: inertia is
monotonically non-increasing and the final assignment is the argmin of
the final centroids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

K = 8
ITERATIONS = 4


def _assign(emb: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """Add (cid, dist2) = nearest centroid per vector.

    The centroid set rides into the plan as a nested array literal;
    aggregate() folds the squared distance per candidate JVM-side, then
    array_position(min) picks the argmin with lowest-index tie-break
    (deterministic: centroids are ordered)."""
    cent = F.array(
        *[
            F.array(*[F.lit(float(x)) for x in c]).cast("array<double>")
            for c in centroids
        ]
    )
    dists = F.transform(
        cent,
        lambda c: F.aggregate(
            F.zip_with(
                F.col("embedding").cast("array<double>"),
                c,
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    return emb.withColumn("__d", dists).select(
        "*",
        (F.array_position(F.col("__d"), F.array_min("__d")) - 1)
        .cast("int")
        .alias("cid"),
        F.array_min("__d").alias("dist2"),
    )


def kmeans_fit(
    spark: SparkSession,
    sf_dir: str,
    k: int = K,
    iterations: int = ITERATIONS,
) -> tuple[list[list[float]], list[float]]:
    """Run Lloyd iterations; returns (final centroids, per-iteration
    inertia). Exposed for the invariant tests."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    # Deterministic seeding: the k lowest vec_ids (k-means++ would add a
    # distance-weighted sampling pass; determinism matters more here).
    init = (
        emb.orderBy("vec_id")
        .limit(k)
        .select("embedding")
        .collect()
    )
    centroids = [[float(x) for x in r.embedding] for r in init]
    inertias: list[float] = []
    for _ in range(iterations):
        assigned = _assign(emb, centroids)
        # One aggregate computes BOTH the update-step sums and the
        # inertia: explode to (cid, dim_idx, component), partial sums
        # combine map-side, and only k*dim tiny rows cross the shuffle.
        cells = assigned.select(
            "cid",
            "dist2",
            F.posexplode(F.col("embedding").cast("array<double>")).alias(
                "dim", "x"
            ),
        )
        stats = (
            cells.groupBy("cid", "dim")
            .agg(
                F.sum("x").alias("sx"),
                F.count(F.lit(1)).alias("n"),
                F.sum("dist2").alias("sd"),
            )
            .collect()
        )
        dim = len(centroids[0])
        sums = {(r.cid, r.dim): r for r in stats}
        # sd double-counts dist2 per dim cell; divide back out.
        inertias.append(
            sum(r.sd for r in stats) / dim
        )
        centroids = [
            [
                (sums[(c, d)].sx / sums[(c, d)].n)
                if (c, d) in sums
                else centroids[c][d]  # empty cluster: keep old centroid
                for d in range(dim)
            ]
            for c in range(len(centroids))
        ]
    return centroids, inertias


@register("q_vector_kmeans", oracle=None)  # rows-only: iterative float
def q_vector_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means cluster census after {it} Lloyd iterations: per-cluster
    size and mean squared distance to the centroid. Rows-only (floats
    through an iterative fixpoint); the Lloyd invariants are asserted
    in tests/test_ext26.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    centroids, _ = kmeans_fit(spark, sf_dir)
    assigned = _assign(emb, centroids)
    return assigned.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.round(F.avg("dist2"), 4).alias("avg_dist2"),
    )


q_vector_kmeans.__doc__ = q_vector_kmeans.__doc__.format(it=ITERATIONS)
