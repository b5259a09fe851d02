"""Ninth vector batch: the composed IVF-PQ search — the billion-scale
ANN architecture end-to-end in one query.

Lineage: q_vector_knn_ivf prunes to coarse cells, q_vector_pq builds
compressed codes; production ANN (FAISS IVFPQ, Jégou et al.) COMPOSES
them — coarse quantizer selects nprobe cells, an asymmetric-distance
lookup table (ADC) scans the probed cells' 4-byte codes without
touching raw vectors, and a small exact re-rank fixes the quantization
error on the shortlist. This file wires the existing pieces into that
single operator, the query a 100 TB vector corpus actually serves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.vectors import as_double_array, cosine_col
from ..registry import register
from .relational_ext14 import _PQ_K, _PQ_M, _PQ_SUBDIM

_NPROBE = 4  # coarse cells scanned (of the label cells)
_SHORTLIST = 100  # ADC candidates kept for exact re-rank
_TOPK = 10

_SQDIST = lambda a, b: F.aggregate(  # noqa: E731 - plan-side lambda
    F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
    F.lit(0.0),
    lambda acc, x: acc + x,
)


def _subvectors(df: DataFrame) -> DataFrame:
    """(vec_id, m, sv): each embedding split into {_PQ_M} contiguous
    {_PQ_SUBDIM}-d subvectors — the PQ decomposition, JVM slice only."""
    return df.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(m).alias("m"),
                        F.slice(
                            as_double_array("embedding"),
                            m * _PQ_SUBDIM + 1,
                            _PQ_SUBDIM,
                        ).alias("sv"),
                    )
                    for m in range(_PQ_M)
                ]
            )
        ).alias("x"),
    ).select("vec_id", F.col("x.m").alias("m"), F.col("x.sv").alias("sv"))


@register("q_vector_ivfpq")  # rows-only: float argmin/ADC are
# ulp-engine-specific; recall floor asserted in tests/test_vector_ivfpq.py
def q_vector_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ search for the vec_id=0 probe: (1) coarse quantizer —
    per-label mean centroids, keep the {_NPROBE} cells nearest the
    probe; (2) ADC scan — candidates in probed cells are represented
    ONLY by their {_PQ_M}-byte PQ codes (deterministic codebook: the
    subvectors of vec_id 0..{_PQ_K}-1, as in q_vector_pq), and the
    probe's distance to each candidate is a sum of {_PQ_M} lookups in a
    {_PQ_M}x{_PQ_K} probe-to-codeword table built once and broadcast;
    (3) exact re-rank — the {_SHORTLIST}-row ADC shortlist rejoins its
    raw vectors for true cosine, returning the top {_TOPK}.

    Scale: this is THE inverted-file layout — cells map to partitions
    (write the corpus partitioned by cell and only nprobe cells' files
    are read); the ADC scan moves 4 bytes/vector instead of 256, and
    raw vectors are touched only for {_SHORTLIST} rows. Every stage is
    JVM higher-order functions over broadcast tables — candidate rows
    never shuffle (the heap-merge top-k pattern of q_vector_knn).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    probe = emb.filter(F.col("vec_id") == 0).select(
        as_double_array("embedding").alias("pe")
    )
    # (1) coarse quantizer: label-cell centroids, nprobe nearest
    dims = emb.select(
        "label", F.posexplode(as_double_array("embedding")).alias("dim", "x")
    )
    centroids = (
        dims.groupBy("label", "dim")
        .agg(F.avg("x").alias("c"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "c"))),
                lambda s: s.c,
            ).alias("centroid")
        )
    )
    top_cells = (
        centroids.crossJoin(F.broadcast(probe))
        .select(
            "label", cosine_col(F.col("centroid"), F.col("pe")).alias("_cc")
        )
        .orderBy(F.desc("_cc"), F.asc("label"))
        .limit(_NPROBE)
        .select("label")
    )
    # (2) PQ codes for probed cells + ADC lookup table
    codebook = _subvectors(emb.filter(F.col("vec_id") < _PQ_K)).select(
        F.col("m").alias("cm"),
        F.col("vec_id").cast("int").alias("cid"),
        F.col("sv").alias("cv"),
    )
    cand = emb.join(F.broadcast(top_cells), "label").filter(
        F.col("vec_id") != 0
    )
    codes = (
        _subvectors(cand)
        .join(F.broadcast(codebook), F.col("m") == F.col("cm"))
        .select(
            "vec_id",
            "m",
            F.struct(
                _SQDIST(F.col("sv"), F.col("cv")).alias("d"),
                F.col("cid").alias("cid"),
            ).alias("dc"),
        )
        .groupBy("vec_id", "m")
        .agg(F.min("dc").alias("best"))
        .select("vec_id", "m", F.col("best.cid").alias("cid"))
    )
    psub = _subvectors(
        emb.filter(F.col("vec_id") == 0).select(
            F.lit(-1).alias("vec_id"), "embedding"
        )
    ).select("m", F.col("sv").alias("psv"))
    lut = psub.join(codebook, F.col("m") == F.col("cm")).select(
        "m", "cid", _SQDIST(F.col("psv"), F.col("cv")).alias("pd")
    )
    shortlist = (
        codes.join(F.broadcast(lut), ["m", "cid"])
        .groupBy("vec_id")
        .agg(F.sum("pd").alias("adc_dist"))
        .orderBy(F.asc("adc_dist"), F.asc("vec_id"))
        .limit(_SHORTLIST)
        .select("vec_id")
    )
    # (3) exact cosine re-rank of the shortlist
    rer = (
        emb.join(F.broadcast(shortlist), "vec_id")
        .crossJoin(F.broadcast(probe))
        .select(
            "vec_id",
            "label",
            cosine_col(as_double_array("embedding"), F.col("pe")).alias("_c"),
        )
    )
    return (
        rer.orderBy(F.desc("_c"), F.asc("vec_id"))
        .limit(_TOPK)
        .select("vec_id", "label", F.round("_c", 6).alias("cos_sim"))
    )
