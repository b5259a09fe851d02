"""Graph batch 5: partition modularity over the part co-purchase graph.

Modularity Q = Σ_c [ L_c/m − (D_c/2m)² ] is THE community-quality metric
(Newman-Girvan; every Louvain/Leiden implementation maximizes it). The
partition scored here is the deterministic p_brand grouping, so both
engines agree on the communities bit-for-bit and the check isolates the
modularity computation itself."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .graph_ext3 import _copurchase_edges, triangle_list

_EDGES_SQL = """
edges AS (
  SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
"""

_MODULARITY_ORACLE = f"""
WITH {_EDGES_SQL},
comm AS (SELECT p_partkey, p_brand FROM part),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM edges),
w AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS lw
  FROM edges e
  JOIN comm ca ON ca.p_partkey = e.pa
  JOIN comm cb ON cb.p_partkey = e.pb
  WHERE ca.p_brand = cb.p_brand),
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
    SELECT pa AS node FROM edges UNION ALL SELECT pb FROM edges)
  GROUP BY node),
dc AS (
  SELECT ca.p_brand, CAST(SUM(d) AS BIGINT) AS dsum
  FROM deg JOIN comm ca ON ca.p_partkey = node GROUP BY ca.p_brand),
s AS (SELECT CAST(SUM(dsum * dsum) AS BIGINT) AS d2,
             CAST(COUNT(*) AS BIGINT) AS nc FROM dc)
SELECT m.m AS n_edges,
       s.nc AS n_communities,
       w.lw AS within_edges,
       CAST(4 * m.m * w.lw - s.d2 AS DOUBLE) / (4.0 * m.m * m.m)
         AS modularity
FROM m, w, s
"""


@register("q_graph_modularity", oracle=_MODULARITY_ORACLE)
def q_graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modularity of the p_brand partition over the co-purchase graph
    (module docstring). Exact-int plan: m, within-edge count L, and the
    per-community degree sums D_c are all integer aggregates; Q is
    assembled as the single float division (4·m·L − ΣD_c²) / 4m² so the
    only inexact op is the last one — bit-identical cross-engine (the
    q_agg_gini trick). Engine side reuses the materialized co-purchase
    edge parquet (shared with triangles/k-core/SSSP); communities
    broadcast onto both edge endpoints; everything else is
    partial-aggregable. ΣD_c² ≤ (2m)² stays under 2^53 for any graph
    this engine materializes as one table."""
    edges = _copurchase_edges(spark, sf_dir)
    comm = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("node"), F.col("p_brand").alias("c")
    )
    ca = comm.select(F.col("node").alias("pa"), F.col("c").alias("c_a"))
    cb = comm.select(F.col("node").alias("pb"), F.col("c").alias("c_b"))
    tagged = edges.join(F.broadcast(ca), "pa").join(F.broadcast(cb), "pb")
    m_w = tagged.agg(
        F.count(F.lit(1)).alias("m"),
        F.count_if(F.col("c_a") == F.col("c_b")).alias("lw"),
    )
    deg = (
        edges.select(F.col("pa").alias("node"))
        .unionByName(edges.select(F.col("pb").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    dc = deg.join(F.broadcast(comm), "node").groupBy("c").agg(
        F.sum("d").alias("dsum")
    )
    s = dc.agg(
        F.sum(F.col("dsum") * F.col("dsum")).alias("d2"),
        F.count(F.lit(1)).alias("nc"),
    )
    return m_w.crossJoin(F.broadcast(s)).select(
        F.col("m").alias("n_edges"),
        F.col("nc").alias("n_communities"),
        F.col("lw").alias("within_edges"),
        (
            (4 * F.col("m") * F.col("lw") - F.col("d2")).cast("double")
            / (4.0 * F.col("m") * F.col("m"))
        ).alias("modularity"),
    )


_CLUSTCOEFF_ORACLE = f"""
WITH {_EDGES_SQL},
tri AS (
  SELECT e1.pa AS x, e1.pb AS y, e2.pb AS z
  FROM edges e1
  JOIN edges e2 ON e1.pb = e2.pa
  JOIN edges e3 ON e3.pa = e1.pa AND e3.pb = e2.pb),
tnode AS (
  SELECT v, CAST(COUNT(*) AS BIGINT) AS t
  FROM (SELECT unnest([x, y, z]) AS v FROM tri) GROUP BY v),
deg AS (
  SELECT v, CAST(COUNT(*) AS BIGINT) AS d
  FROM (SELECT pa AS v FROM edges UNION ALL SELECT pb FROM edges)
  GROUP BY v)
SELECT d.v AS part, d.d AS degree,
       COALESCE(t.t, 0) AS n_triangles,
       ROUND(2.0 * COALESCE(t.t, 0) / (d.d * (d.d - 1)), 4)
         AS clustering_coeff
FROM deg d LEFT JOIN tnode t ON d.v = t.v
WHERE d.d >= 2
ORDER BY 2.0 * COALESCE(t.t, 0) / (d.d * (d.d - 1)) DESC, d.v
LIMIT 100
"""


@register("q_graph_clustering_coeff", oracle=_CLUSTCOEFF_ORACLE)
def q_graph_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient: top-100 parts by 2·T(v) /
    (deg(v)·(deg(v)−1)) with min degree 2 — the per-node version of the
    global triangle count (community tightness, link-prediction
    feature). Triangles come from the shared
    materialized triangle_list parquet (graph_ext3; same id-oriented
    x<y<z wedge join as q_graph_triangles, enumerated once), then each
    triangle credits its three corners via one posexplode-free
    explode+aggregate; degrees come from the symmetrized edge list.
    Exact ints throughout; the coefficient is one IEEE division ordered
    exactly, so ranking and the 4-dp rounding agree cross-engine."""
    pairs = _copurchase_edges(spark, sf_dir)
    tri = triangle_list(spark, sf_dir)
    tnode = (
        tri.select(
            F.explode(F.array("x", "y", "z")).alias("v")
        )
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("t"))
    )
    deg = (
        pairs.select(F.col("pa").alias("v"))
        .unionByName(pairs.select(F.col("pb").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
        .filter(F.col("d") >= 2)
    )
    coeff = (
        F.lit(2.0)
        * F.coalesce("t", F.lit(0))
        / (F.col("d") * (F.col("d") - 1))
    )
    return (
        deg.join(tnode, "v", "left")
        .select(
            F.col("v").alias("part"),
            F.col("d").alias("degree"),
            F.coalesce("t", F.lit(0)).alias("n_triangles"),
            coeff.alias("_c"),
            F.round(coeff, 4).alias("clustering_coeff"),
        )
        .orderBy(F.desc("_c"), F.asc("part"))
        .limit(100)
        .select("part", "degree", "n_triangles", "clustering_coeff")
    )
