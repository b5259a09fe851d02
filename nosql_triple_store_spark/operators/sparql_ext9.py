"""Round-9 SPARQL surface (VERDICT r8 #4, #5, #7): named graphs over
the graph-partitioned quad layout, the SPARQL Update subset compiled to
the engine's LWW-upsert state algebra, and ORDER BY expressions.

Reference parity: SPARQL Update is the textual twin of the reference's
write path — R2 keyed upsert (SQLite3DBConnector.py:48-119) and the
R8 delta-dict last-wins overwrite (MasterServer.py:106-115) — the one
reference capability that had no SPARQL-text surface until now. Named
graphs generalize the reference's physical source-split (SURVEY §1.4)
into the standard SPARQL dataset feature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..plans.bgp import TRIPLES_SQL
from ..plans.quads import QUADS_SQL
from ..plans.sparql import compile_sparql_encoded, compile_sparql_update
from ..registry import register

_GRAPH_Q = """
SELECT ?g (COUNT(*) AS ?n) WHERE {
  GRAPH ?g { ?s inNation ?o }
} GROUP BY ?g
"""


@register(
    "q_sparql_graph",
    oracle=f"""
WITH {QUADS_SQL}
SELECT g, CAST(COUNT(*) AS BIGINT) AS n
FROM quads WHERE p = 'inNation' GROUP BY g
""",
)
def q_sparql_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`GRAPH ?g {{ ?s inNation ?o }}`: the graph variable binds each
    named graph (entity family) holding inNation triples — customers
    and suppliers — counted per graph. The ?g column is the parquet
    partition column, materialized for free by the scan."""
    return compile_sparql_encoded(spark, sf_dir, _GRAPH_Q)


_GRAPH_CONST_Q = """
SELECT ?seg (COUNT(*) AS ?n) WHERE {
  GRAPH <g:customer> { ?c inSegment ?seg }
} GROUP BY ?seg
"""


@register(
    "q_sparql_graph_const",
    oracle=f"""
WITH {QUADS_SQL}
SELECT o AS seg, CAST(COUNT(*) AS BIGINT) AS n
FROM quads WHERE g = 'g:customer' AND p = 'inSegment' GROUP BY o
""",
)
def q_sparql_graph_const(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`GRAPH <g:customer> {{ ... }}`: a CONSTANT graph term — the
    g='g:customer' predicate prunes every other graph's `g=` partition
    directory at the manifest (PartitionFilters; pinned in
    tests/test_sparql_graphs.py). Segment histogram inside the one
    scanned graph."""
    return compile_sparql_encoded(spark, sf_dir, _GRAPH_CONST_Q)


_FROM_NAMED_Q = """
SELECT ?g ?o (COUNT(*) AS ?n)
FROM NAMED <g:supplier>
WHERE { GRAPH ?g { ?s inNation ?o } }
GROUP BY ?g ?o
"""


@register(
    "q_sparql_from_named",
    oracle=f"""
WITH {QUADS_SQL}
SELECT g, o, CAST(COUNT(*) AS BIGINT) AS n
FROM quads WHERE g IN ('g:supplier') AND p = 'inNation'
GROUP BY g, o
""",
)
def q_sparql_from_named(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`FROM NAMED <g:supplier>` restricts the graph universe: the
    same GRAPH ?g pattern as q_sparql_graph now ranges over suppliers
    only (customers' inNation triples excluded by the dataset clause,
    not by a pattern constant) — per-nation supplier counts."""
    return compile_sparql_encoded(spark, sf_dir, _FROM_NAMED_Q)


_UPDATE_Q = """
INSERT DATA {
  <customer:1> inSegment "PROMO_X" .
  <region:99> hasName "NEWLAND" .
  <region:99> hasName "NEWLAND_2" .
} ;
DELETE DATA { <nation:3> inRegion <region:3> . } ;
DELETE WHERE { ?s hasBalanceCents ?v }
"""


@register(
    "q_sparql_update",
    oracle=f"""
WITH {TRIPLES_SQL},
ins AS (SELECT * FROM (VALUES
    ('customer:1', 'inSegment', 'PROMO_X'),
    ('region:99', 'hasName', 'NEWLAND_2')) v(s, p, o)),
st1 AS (
  SELECT t.s, t.p, t.o FROM triples t
  WHERE NOT EXISTS (SELECT 1 FROM ins i WHERE i.s = t.s AND i.p = t.p)
  UNION ALL SELECT s, p, o FROM ins),
st2 AS (SELECT * FROM st1
        WHERE NOT (s = 'nation:3' AND p = 'inRegion' AND o = 'region:3'))
SELECT s, p, o FROM st2 WHERE NOT (p = 'hasBalanceCents')
""",
)
def q_sparql_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL Update sequence applied as a state transformation (the
    engine's storage is immutable parquet — q_upsert_result's
    contract): an INSERT DATA batch with (a) an upsert of an EXISTING
    (s, p) key (customer:1 inSegment — old object replaced, R2
    semantics), (b) a brand-new key, and (c) a batch-internal
    duplicate key where the LAST write wins (region:99 — the
    reference's delta-dict overwrite, R8); then an exact-triple
    DELETE DATA; then a pattern DELETE WHERE removing a whole
    predicate family. Output: the full post-update triple state,
    matched against the oracle's replay of the same algebra."""
    return compile_sparql_update(spark, sf_dir, _UPDATE_Q)


@register(
    "q_sparql_describe",
    oracle=f"""
WITH {TRIPLES_SQL}
SELECT s, p, o FROM triples WHERE s = 'nation:7'
UNION
SELECT s, p, o FROM triples WHERE o = 'nation:7'
""",
)
def q_sparql_describe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Textual `DESCRIBE <nation:7>` — the q_bgp_describe neighborhood
    (every triple where the resource is subject or object) now
    reachable from query text, with graph set semantics (UNION, not
    UNION ALL: a description is a graph). Constant iris push into both
    scans."""
    return compile_sparql_encoded(spark, sf_dir, "DESCRIBE <nation:7>")


@register(
    "q_sparql_describe_where",
    oracle=f"""
WITH {TRIPLES_SQL},
res AS (SELECT DISTINCT s AS r FROM triples
        WHERE p = 'inRegion' AND o = 'region:2')
SELECT t.s, t.p, t.o FROM triples t JOIN res ON t.s = res.r
UNION
SELECT t.s, t.p, t.o FROM triples t JOIN res ON t.o = res.r
""",
)
def q_sparql_describe_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`DESCRIBE ?n WHERE {{ ?n inRegion <region:2> }}`: the described
    resources come from a WHERE solution (all nations of region 2) —
    the variable form compiles its body through the normal encoded
    pipeline, then joins the distinct bindings against both triple
    positions."""
    return compile_sparql_encoded(
        spark,
        sf_dir,
        "DESCRIBE ?n WHERE { ?n inRegion <region:2> }",
    )


_ORDER_EXPR_Q = """
SELECT ?nm ?rn WHERE {
  ?n hasName ?nm .
  ?n inRegion ?r .
  ?r hasName ?rn .
}
ORDER BY DESC(STRLEN(?nm)) ?nm
LIMIT 10
"""


@register(
    "q_sparql_order_expr",
    oracle=f"""
WITH {TRIPLES_SQL}
SELECT b.o AS nm, c.o AS rn
FROM triples a
JOIN triples b ON b.s = a.s AND b.p = 'hasName'
JOIN triples c ON c.s = a.o AND c.p = 'hasName'
WHERE a.p = 'inRegion'
ORDER BY LENGTH(b.o) DESC, b.o
LIMIT 10
""",
)
def q_sparql_order_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY over an EXPRESSION (round 9 — the last everyday-SELECT
    gap): nations sorted by descending name length with the unique
    name itself as tiebreak (deterministic LIMIT cut), through the
    same expression grammar BIND uses."""
    return compile_sparql_encoded(spark, sf_dir, _ORDER_EXPR_Q)
