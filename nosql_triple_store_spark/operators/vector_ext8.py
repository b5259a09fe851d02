"""Eighth vector batch: retrieval-quality evaluation as a first-class
query.

Lineage: every ANN deployment runs a recall eval before swapping the
index; in a Spark-native engine that eval IS a query — exact and
approximate retrieval for a probe set computed side by side, recall@k
as an exact integer ppm per probe. Deterministic end to end (fixed
probes, integer Hamming shortlist, rounded-cosine ranking with vec_id
tiebreaks), so the eval is reproducible across engines and reruns —
registered rows-only because the approximate side's SQL twin would be
the implementation itself, and pinned instead by invariant tests
(recall bounds, determinism, exact-side self-recall = 1e6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.topk import grouped_topk
from ..functions.vectors import as_double_array, cosine_col
from ..registry import register
from ..materialize import materialize

_EV_PROBES = 8
_EV_K = 10
_EV_CAND = 32


def _pack_expr(a: int, b: int) -> str:
    return (
        "aggregate(sequence({a}, {b}), CAST(0 AS BIGINT), (acc, i) ->"
        " acc + IF(element_at(CAST(embedding AS ARRAY<DOUBLE>), CAST(i"
        " AS INT)) > 0D, shiftleft(CAST(1 AS BIGINT), CAST(i - {a} AS"
        " INT)), CAST(0 AS BIGINT)))"
    ).format(a=a, b=b)


@register("q_vector_eval_recall", oracle=None)  # rows-only: eval harness
def q_vector_eval_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{_EV_K} of 1-bit quantized retrieval vs exact cosine, per
    probe, over {_EV_PROBES} probes in one pass: both methods score
    against the same corpus, take top-{_EV_K} per probe under the same
    rounded-cosine order (the quantized side restricted to its
    {_EV_CAND}-candidate Hamming shortlist), and recall is the exact
    intersection size in ppm. The index-quality gate a retrieval
    pipeline checks before shipping a 32x-smaller index.

    Scale: probes broadcast; the exact side is the q_vector_knn_batch
    plan (salted grouped top-k); the quantized side adds only the
    codegen'd sign-pack + popcount shortlist. The recall join compares
    two {_EV_PROBES}x{_EV_K}-row sets — constant size.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    m = emb.select(
        "vec_id",
        "embedding",
        F.expr(_pack_expr(1, 32)).alias("lo"),
        F.expr(_pack_expr(33, 64)).alias("hi"),
    ).transform(materialize)
    probes = m.filter(F.col("vec_id") < _EV_PROBES).select(
        F.col("vec_id").alias("probe_id"),
        as_double_array("embedding").alias("pe"),
        F.col("lo").alias("plo"),
        F.col("hi").alias("phi"),
    )
    scored = (
        m.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "vec_id",
            F.round(
                cosine_col(as_double_array("embedding"), F.col("pe")), 6
            ).alias("c6"),
            (
                F.bit_count(F.col("lo").bitwiseXOR(F.col("plo")))
                + F.bit_count(F.col("hi").bitwiseXOR(F.col("phi")))
            ).cast("long").alias("hamming"),
        )
        .transform(materialize)
    )
    exact = grouped_topk(
        scored,
        ["probe_id"],
        [F.desc("c6"), F.asc("vec_id")],
        _EV_K,
        salt_on="vec_id",
    ).select("probe_id", "vec_id")
    shortlist = grouped_topk(
        scored,
        ["probe_id"],
        [F.asc("hamming"), F.asc("vec_id")],
        _EV_CAND,
        salt_on="vec_id",
    )
    approx = grouped_topk(
        shortlist.drop("rank"),
        ["probe_id"],
        [F.desc("c6"), F.asc("vec_id")],
        _EV_K,
        salt_on="vec_id",
    ).select("probe_id", F.col("vec_id").alias("avid"))
    hits = exact.join(
        approx,
        (exact.probe_id == approx.probe_id)
        & (exact.vec_id == approx.avid),
    ).groupBy(exact.probe_id).agg(F.count(F.lit(1)).alias("n_hit"))
    base = exact.groupBy("probe_id").agg(
        F.count(F.lit(1)).alias("n_exact")
    )
    return (
        base.join(hits, "probe_id", "left")
        .select(
            "probe_id",
            F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
            "n_exact",
            F.expr(
                "CAST(COALESCE(n_hit, 0) * 1000000 div n_exact AS BIGINT)"
            ).alias("recall_ppm"),
        )
    )
