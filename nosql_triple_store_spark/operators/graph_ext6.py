"""Sixth graph extension: HITS (hubs & authorities).

Lineage: completes the spectral-ranking pair next to q_graph_pagerank —
HITS is the other canonical link-analysis fixpoint (Kleinberg 1999),
computing mutually-reinforcing hub scores (points at good authorities)
and authority scores (pointed at by good hubs) as the principal
singular pair of the adjacency matrix.

Same execution shape as PageRank (graph.py:206): a Pregel-style
join-aggregate per half-step over the edge DataFrame, localCheckpoint
per round to cut lineage, and a delta-based convergence exit capped at
a fixed round budget. Normalization is by the L2 norm — two scalar
aggregates per round (O(1) driver values, not data collects). Scores
are float so merge order injects ~1e-15; outputs round to 6 dp and the
query is rows-only deterministic, with a numpy differential test
(tests/test_ext35.py) asserting the distributed fixpoint matches dense
power iteration on the same matrix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .graph import _edges

_HITS_MAX_ROUNDS = 12
_HITS_TOL = 1e-7


def hits_scores(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Run HITS to convergence; return (hubs, authorities) DataFrames
    with unrounded float scores (callers round for display)."""
    e = _edges(spark, sf_dir).localCheckpoint()
    hubs = (
        e.select(F.col("src").alias("node_id"))
        .distinct()
        .select("node_id", F.lit(1.0).alias("h"))
        .localCheckpoint()
    )
    auth = None
    for _ in range(_HITS_MAX_ROUNDS):
        # authority half-step: a(v) = Σ_{u→v} h(u), then L2-normalize
        auth_new = (
            e.join(hubs, e.src == hubs.node_id)
            .groupBy(F.col("dst").alias("node_id"))
            .agg(F.sum("h").alias("a"))
        )
        norm_a = auth_new.agg(
            F.sqrt(F.sum(F.col("a") * F.col("a"))).alias("n")
        ).first()["n"]
        auth_new = auth_new.select(
            "node_id", (F.col("a") / F.lit(norm_a)).alias("a")
        ).localCheckpoint()
        # hub half-step: h(u) = Σ_{u→v} a(v), then L2-normalize
        hub_new = (
            e.join(auth_new, e.dst == auth_new.node_id)
            .groupBy(F.col("src").alias("node_id"))
            .agg(F.sum("a").alias("h"))
        )
        norm_h = hub_new.agg(
            F.sqrt(F.sum(F.col("h") * F.col("h"))).alias("n")
        ).first()["n"]
        hub_new = hub_new.select(
            "node_id", (F.col("h") / F.lit(norm_h)).alias("h")
        ).localCheckpoint()
        delta = (
            hub_new.join(
                hubs.select("node_id", F.col("h").alias("prev")),
                "node_id",
                "left",
            )
            .agg(
                F.max(
                    F.abs(F.col("h") - F.coalesce("prev", F.lit(0.0)))
                ).alias("d")
            )
            .first()["d"]
        )
        hubs, auth = hub_new, auth_new
        if delta is not None and delta < _HITS_TOL:
            break
    return hubs, auth


@register("q_graph_hits")  # rows-only: float fixpoint, no SQL oracle
def q_graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 hubs and top-20 authorities by HITS score over the
    hierarchy graph (customer→nation→region, graph.py:29). Each row is
    (role, node_id, score): on this DAG customers are pure hubs and
    nations/regions pure authorities, so the two role slices don't
    overlap. Deterministic: scores round to 6 dp and ties break on
    node_id; the underlying fixpoint is tested against dense numpy
    power iteration."""
    hubs, auth = hits_scores(spark, sf_dir)
    top_h = (
        hubs.select(
            F.lit("hub").alias("role"),
            "node_id",
            F.round("h", 6).alias("score"),
        )
        .orderBy(F.desc("score"), "node_id")
        .limit(20)
    )
    top_a = (
        auth.select(
            F.lit("authority").alias("role"),
            "node_id",
            F.round("a", 6).alias("score"),
        )
        .orderBy(F.desc("score"), "node_id")
        .limit(20)
    )
    return top_h.unionByName(top_a)
