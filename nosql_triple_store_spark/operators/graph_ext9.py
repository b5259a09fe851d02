"""Ninth graph batch: harmonic closeness and exact betweenness
centrality.

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
from ..materialize import materialize
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
       CAST(COALESCE(SUM(1000000 // sp.dist), 0) AS BIGINT)
         AS harmonic_ppm,
       CAST(COUNT(sp.d) AS BIGINT) AS n_reachable
FROM vs LEFT JOIN sp ON sp.s = vs.v
GROUP BY vs.v
""",
)
def q_graph_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harmonic closeness census: for every state node, the sum of
    reciprocal shortest-path distances to every other reachable state
    (sinks score 0). High harmonic = a hub that reaches the whole
    graph in few hops — the navigation-centrality complement to
    PageRank's endorsement view; the ranking feeds the same curation
    decisions (which event states are structural hubs vs periphery).
    Accumulated in EXACT integer ppm (floor(10^6/dist) per reachable
    node, distances are integers) like the sibling betweenness — a
    float SUM(1.0/dist) is summation-order dependent and could flip a
    ROUND(.,3) boundary between engines.

    Scale: the all-pairs distance relation is the one expensive input
    and is BFS-layered in O(diameter) rounds of equi-join + anti-join,
    bounded by |V|^2 pairs of the DOMAIN-bounded state graph; the
    centrality itself is one partial-aggregable sum per source. For
    billion-node graphs, run the identical code over a sampled source
    set — sampled harmonic centrality is the standard estimator
    (Eppstein-Wang) and only the source filter changes.
    """
    ed = _digraph(spark, sf_dir).transform(materialize)
    vs = ed.select(F.col("a").alias("v")).union(ed.select("b")).distinct()
    sp = _all_pairs_dists(ed).filter(F.col("s") != F.col("d"))
    per_src = sp.groupBy("s").agg(
        F.sum(
            F.floor(F.lit(1_000_000) / F.col("l")).cast("long")
        ).alias("h"),
        F.count(F.lit(1)).cast("long").alias("n_reachable"),
    )
    return vs.join(per_src, vs.v == per_src.s, "left").select(
        F.col("v").alias("node"),
        F.coalesce("h", F.lit(0)).cast("long").alias("harmonic_ppm"),
        F.coalesce("n_reachable", F.lit(0)).alias("n_reachable"),
    )


@register(
    "q_graph_betweenness",
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
  FROM walk WHERE s <> d GROUP BY s, d),
geo(s, d, l) AS (
  -- every row is a geodesic path INSTANCE: each extension step joins
  -- sp at dist = l + 1, so by induction the path length equals the
  -- shortest distance at every prefix
  SELECT a, b, 1 FROM ed
  UNION ALL
  SELECT g.s, e.b, g.l + 1
  FROM geo g JOIN ed e ON e.a = g.d
  JOIN sp ON sp.s = g.s AND sp.d = e.b AND sp.dist = g.l + 1),
sig AS (
  SELECT s, d, MIN(l) AS dist, CAST(COUNT(*) AS BIGINT) AS sigma
  FROM geo WHERE s <> d GROUP BY s, d),
bc AS (
  SELECT sv.d AS v,
         CAST(SUM((sv.sigma * vd.sigma * 1000000) // sd.sigma) AS BIGINT)
           AS bc_ppm,
         CAST(COUNT(*) AS BIGINT) AS n_pair_routes
  FROM sig sv
  JOIN sig vd ON vd.s = sv.d AND vd.d <> sv.s
  JOIN sig sd ON sd.s = sv.s AND sd.d = vd.d
             AND sd.dist = sv.dist + vd.dist
  GROUP BY sv.d)
SELECT vs.v AS node,
       COALESCE(bc.bc_ppm, 0) AS bc_ppm,
       COALESCE(bc.n_pair_routes, 0) AS n_pair_routes
FROM vs LEFT JOIN bc ON bc.v = vs.v
""",
)
def q_graph_betweenness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT betweenness centrality on the state digraph: for every
    node v, the sum over ordered pairs (s, d) of the fraction of s→d
    geodesics passing THROUGH v — the classic brokerage centrality
    (which states sit on the traffic between other states). Computed
    from the shared multi-source BFS's geodesic counts via Bhandari's
    pair-dependency identity: sigma_sd(v) = sigma(s,v)·sigma(v,d)
    whenever dist(s,v) + dist(v,d) = dist(s,d); per-pair fractions are
    accumulated in exact integer PPM (floor of x·10^6), so the oracle
    matches bit-for-bit with no float-summation-order hazard (the same
    trick as q_graph_link_predict's RA index). n_pair_routes counts
    the (s, d) pairs v brokers at all.

    Scale: the distance+sigma relation is the BFS loop's output
    (O(diameter) rounds, partial-aggregable sigma sums); the dependency
    accumulation is two self-equi-joins of that relation on single key
    columns plus one aggregate — all hash-shuffled on pair keys, no
    all-pairs blowup beyond the |reachable pairs| relation itself. For
    graphs where |pairs| explodes, sample sources (Brandes-Pich):
    filter s to a sample and rescale — only the first join's left input
    changes.
    """
    ed = _digraph(spark, sf_dir).transform(materialize)
    vs = ed.select(F.col("a").alias("v")).union(ed.select("b")).distinct()
    sig = (
        _all_pairs_dists(ed)
        .filter(F.col("s") != F.col("d"))
        .select("s", "d", F.col("l").alias("dist"), "sigma")
        .transform(materialize)
    )
    sv = sig.select(
        F.col("s").alias("src"),
        F.col("d").alias("v"),
        F.col("dist").alias("d1"),
        F.col("sigma").alias("sig1"),
    )
    vd = sig.select(
        F.col("s").alias("v2"),
        F.col("d").alias("dst"),
        F.col("dist").alias("d2"),
        F.col("sigma").alias("sig2"),
    )
    sd = sig.select(
        F.col("s").alias("src3"),
        F.col("d").alias("dst3"),
        F.col("dist").alias("d3"),
        F.col("sigma").alias("sig3"),
    )
    dep = (
        sv.join(vd, (sv.v == vd.v2) & (sv.src != vd.dst))
        .join(
            sd,
            (F.col("src") == F.col("src3"))
            & (F.col("dst") == F.col("dst3"))
            & (F.col("d3") == F.col("d1") + F.col("d2")),
        )
        .groupBy("v")
        .agg(
            F.sum(
                F.expr("(sig1 * sig2 * CAST(1000000 AS BIGINT)) div sig3")
            ).alias("bc_ppm"),
            F.count(F.lit(1)).cast("long").alias("n_pair_routes"),
        )
    )
    return vs.join(dep, vs.v == dep.v, "left").select(
        vs.v.alias("node"),
        F.coalesce("bc_ppm", F.lit(0)).alias("bc_ppm"),
        F.coalesce("n_pair_routes", F.lit(0)).alias("n_pair_routes"),
    )
