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
from .graph_ext3 import _copurchase_edges

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
