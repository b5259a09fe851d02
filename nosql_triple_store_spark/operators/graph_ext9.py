"""Ninth graph batch: harmonic closeness centrality.

Lineage: the third classic centrality after degree (q_graph_degree)
and PageRank (q_graph_pagerank) — "how quickly does this state reach
everything else?". Harmonic form (sum of 1/dist) rather than classic
closeness because it is well-defined on DISCONNECTED graphs:
unreachable pairs contribute 0 instead of poisoning the mean with
infinities. Rides the shared simultaneous multi-source BFS
(graph_ext8._all_pairs_dists), so the distance relation is computed
once per plan with the same convergence guard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .graph_ext7 import _DIGRAPH_SQL, _digraph
from .graph_ext8 import _ECC_MAX_ROUNDS, _all_pairs_dists


@register(
    "q_graph_closeness",
    oracle=f"""
WITH RECURSIVE {_DIGRAPH_SQL},
vs AS (
  SELECT DISTINCT v
  FROM (SELECT a AS v FROM ed UNION ALL SELECT b FROM ed) u),
walk(s, d, l) AS (
  SELECT a, b, 1 FROM ed
  UNION
  SELECT w.s, e2.b, w.l + 1
  FROM walk w JOIN ed e2 ON e2.a = w.d
  WHERE w.l < {_ECC_MAX_ROUNDS}),
sp AS (
  SELECT s, d, MIN(l) AS dist
  FROM walk WHERE s <> d GROUP BY s, d)
SELECT vs.v AS node,
       ROUND(COALESCE(SUM(1.0 / sp.dist), 0.0), 3) AS harmonic,
       CAST(COUNT(sp.d) AS BIGINT) AS n_reachable
FROM vs LEFT JOIN sp ON sp.s = vs.v
GROUP BY vs.v
""",
)
def q_graph_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harmonic closeness census: for every state node, the sum of
    reciprocal shortest-path distances to every other reachable state
    (sinks score 0.0). High harmonic = a hub that reaches the whole
    graph in few hops — the navigation-centrality complement to
    PageRank's endorsement view; the ranking feeds the same curation
    decisions (which event states are structural hubs vs periphery).

    Scale: the all-pairs distance relation is the one expensive input
    and is BFS-layered in O(diameter) rounds of equi-join + anti-join,
    bounded by |V|^2 pairs of the DOMAIN-bounded state graph; the
    centrality itself is one partial-aggregable sum per source. For
    billion-node graphs, run the identical code over a sampled source
    set — sampled harmonic centrality is the standard estimator
    (Eppstein-Wang) and only the source filter changes.
    """
    ed = _digraph(spark, sf_dir).localCheckpoint()
    vs = ed.select(F.col("a").alias("v")).union(ed.select("b")).distinct()
    sp = _all_pairs_dists(ed).filter(F.col("s") != F.col("d"))
    per_src = sp.groupBy("s").agg(
        F.sum(F.lit(1.0) / F.col("l")).alias("h"),
        F.count(F.lit(1)).cast("long").alias("n_reachable"),
    )
    return vs.join(per_src, vs.v == per_src.s, "left").select(
        F.col("v").alias("node"),
        F.round(F.coalesce("h", F.lit(0.0)), 3).alias("harmonic"),
        F.coalesce("n_reachable", F.lit(0)).alias("n_reachable"),
    )
