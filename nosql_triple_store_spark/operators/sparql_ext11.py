"""Round-11 SPARQL dataset-scoping closers (VERDICT r10 #7 + ADVICE
r10 #1): `WITH <g>` / `USING <g>` scoped update templates, and the
spec-correct FROM + FROM NAMED + GRAPH dataset-clause combination.

All scoping lowers to scan-local subject-family predicates, because
the quad layout derives each triple's graph from its subject's entity
prefix (plans/quads.py provenance rule) — no joins are added by a
dataset clause. Reference parity: the reference scopes every write to
one backend shard by key routing (MasterServer.py:77-87); WITH/USING
are the declarative generalization of that write-scoping to named
provenance domains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..plans.quads import QUADS_SQL
from ..plans.sparql import compile_sparql_encoded, compile_sparql_update
from ..registry import register

_UPDATE_WITH_Q = """
WITH <g:region>
DELETE { ?r hasName ?n }
INSERT { ?r hasName "R_RENAMED" }
WHERE { ?r hasName ?n }
"""


@register(
    "q_sparql_update_with",
    oracle=f"""
WITH {QUADS_SQL}
SELECT s, p, o FROM quads WHERE NOT (g = 'g:region' AND p = 'hasName')
UNION
SELECT DISTINCT s, 'hasName' AS p, 'R_RENAMED' AS o
FROM quads WHERE g = 'g:region' AND p = 'hasName'
""",
)
def q_sparql_update_with(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`WITH <g:region>` scoped template update (round 11, VERDICT r10
    #7): hasName exists in BOTH g:region and g:nation, but the WITH
    clause scopes WHERE evaluation AND delete application to the
    region graph — region names are renamed, nation names untouched.
    The scope is one subject-family string predicate on the state
    (quads_view provenance rule), and the insert subject ?r is
    statically provable as region-family (subject position of the
    WITH-scoped WHERE), so the layout's graph-from-subject invariant
    holds. Output: the full post-update graph."""
    return compile_sparql_update(spark, sf_dir, _UPDATE_WITH_Q)


_UPDATE_USING_Q = """
DELETE { ?s inNation ?n }
INSERT { ?n hadMember ?s }
USING <g:supplier>
WHERE { ?s inNation ?n }
"""


@register(
    "q_sparql_update_using",
    oracle=f"""
WITH {QUADS_SQL}
SELECT s, p, o FROM quads WHERE NOT (g = 'g:supplier' AND p = 'inNation')
UNION
SELECT DISTINCT o AS s, 'hadMember' AS p, s AS o
FROM quads WHERE g = 'g:supplier' AND p = 'inNation'
""",
)
def q_sparql_update_using(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`USING <g:supplier>` dataset clause on a template update (round
    11, VERDICT r10 #7): inNation edges exist for customers AND
    suppliers, but USING re-scopes the WHERE's default graph to the
    supplier graph only — supplier membership edges are deleted and
    reversed into nation-side hadMember edges, customer edges survive.
    The DELETE/INSERT themselves stay default-graph-wide (no WITH),
    per SPARQL 1.1 Update §3.1.3 precedence. Output: the full
    post-update graph."""
    return compile_sparql_update(spark, sf_dir, _UPDATE_USING_Q)


_DATASET_CLAUSE_Q = """
SELECT ?g ?nat (COUNT(*) AS ?n)
FROM <g:customer>
FROM NAMED <g:supplier>
WHERE { ?c inNation ?nat . GRAPH ?g { ?s inNation ?nat } }
GROUP BY ?g ?nat
"""


@register(
    "q_sparql_dataset_clause",
    oracle=f"""
WITH {QUADS_SQL}
SELECT 'g:supplier' AS g, c.o AS nat, CAST(COUNT(*) AS BIGINT) AS n
FROM quads c JOIN quads s2 ON s2.o = c.o
WHERE c.g = 'g:customer' AND c.p = 'inNation'
  AND s2.g = 'g:supplier' AND s2.p = 'inNation'
GROUP BY c.o
""",
)
def q_sparql_dataset_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FROM + FROM NAMED + GRAPH combined (round 11, ADVICE r10 #1): a
    dataset clause replaces the WHOLE dataset (SPARQL 1.1 §13.2) — the
    top-level pattern ranges over the customer graph as the default
    graph, while GRAPH ?g ranges over EXACTLY the FROM NAMED set (the
    supplier graph; with FROM alone the named set is empty and GRAPH
    matches nothing — pinned in tests/test_sparql_graphs.py). Joined
    on the shared ?nat: customer×supplier co-membership counts per
    nation."""
    return compile_sparql_encoded(spark, sf_dir, _DATASET_CLAUSE_Q)
