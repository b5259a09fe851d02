"""Similarity search over the embeddings table (task brief): brute-force
cosine top-k as the exact baseline, IVF-partitioned search as the scale
path.

Scale design: exact top-k is TakeOrderedAndProject — each task keeps a
k-row heap over its partition, the driver merges heaps; no global sort, no
shuffle of the scored rows. The IVF variant prunes the scan to the nearest
coarse partitions (here: the `label` column as the quantizer cell), the
standard recall/latency trade — at 1000 executors only the probed cells'
files are read when the table is written partitioned by cell.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.vectors import as_double_array, cosine_col
from ..registry import register

_KNN_ORACLE = """
WITH p AS (SELECT embedding::DOUBLE[] AS pe FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id, e.label,
       ROUND(list_cosine_similarity(e.embedding::DOUBLE[], p.pe), 6)
         AS cos_sim
FROM embeddings e, p
WHERE e.vec_id <> 0
ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], p.pe) DESC, e.vec_id
LIMIT 10
"""


@register("q_vector_knn", oracle=_KNN_ORACLE)
def q_vector_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 neighbors of the vec_id=0 probe.

    Probe is broadcast (single row), scoring is a codegen'd higher-order
    function over every vector, selection is a per-partition heap merge —
    the brute-force baseline every ANN variant is measured against.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    probe = emb.filter(F.col("vec_id") == 0).select(
        as_double_array("embedding").alias("pe")
    )
    scored = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(probe))
        .select(
            "vec_id",
            "label",
            cosine_col(as_double_array("embedding"), F.col("pe")).alias("_c"),
        )
    )
    return (
        scored.orderBy(F.desc("_c"), F.asc("vec_id"))
        .limit(10)
        .select("vec_id", "label", F.round("_c", 6).alias("cos_sim"))
    )


@register("q_vector_knn_ivf", oracle=None)  # rows-only: approximate search
def q_vector_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: coarse-quantize by `label` (centroid = element-wise
    mean per label), probe the 3 nearest cells, exact top-10 within them.

    All DataFrame ops: centroids via posexplode + avg per (label, dim),
    probe-to-centroid ranking picks cells, the final scan is pruned to
    ~3/10ths of the data. Approximate ⇒ rows-only; tests/test_vector.py
    measures recall against q_vector_knn (exact).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    probe = emb.filter(F.col("vec_id") == 0).select(
        as_double_array("embedding").alias("pe")
    )
    dims = emb.select(
        "label", F.posexplode(as_double_array("embedding")).alias("dim", "x")
    )
    centroids = (
        dims.groupBy("label", "dim")
        .agg(F.avg("x").alias("c"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "c"))), lambda s: s.c
            ).alias("centroid")
        )
    )
    top_cells = (
        centroids.crossJoin(F.broadcast(probe))
        .select(
            "label", cosine_col(F.col("centroid"), F.col("pe")).alias("_cc")
        )
        .orderBy(F.desc("_cc"), F.asc("label"))
        .limit(3)
        .select("label")
    )
    pruned = emb.join(F.broadcast(top_cells), "label").filter(
        F.col("vec_id") != 0
    )
    scored = pruned.crossJoin(F.broadcast(probe)).select(
        "vec_id",
        "label",
        cosine_col(as_double_array("embedding"), F.col("pe")).alias("_c"),
    )
    return (
        scored.orderBy(F.desc("_c"), F.asc("vec_id"))
        .limit(10)
        .select("vec_id", "label", F.round("_c", 6).alias("cos_sim"))
    )
