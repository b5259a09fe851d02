"""Round-9 SPARQL everyday-SELECT closers: COUNT(DISTINCT ?v),
FILTER ... IN / NOT IN list membership, and the string predicates
CONTAINS / STRSTARTS / STRENDS — the remaining constructs a working
SPARQL user types weekly that the subset still rejected after the
round-9 verdict items landed.

All compile through the same encoded-store pipeline as every other
q_sparql_* query: IN/NOT IN and the string predicates run post-decode
(string collation semantics, like REGEX), COUNT(DISTINCT) is one
hash-distinct aggregate in the grouped plan. Reference parity: the
reference's /search has no textual query language at all
(RESTServer.py routes fixed patterns); this keeps generalizing its RDF
domain into the standard query surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..plans.bgp import TRIPLES_SQL
from ..plans.quads import QUADS_SQL
from ..plans.sparql import compile_sparql_encoded
from ..registry import register

_COUNT_DISTINCT_Q = """
SELECT ?seg (COUNT(DISTINCT ?nat) AS ?n_nations) (COUNT(*) AS ?n_customers)
WHERE {
  ?c inSegment ?seg .
  ?c inNation ?nat
} GROUP BY ?seg
"""


@register(
    "q_sparql_count_distinct",
    oracle=f"""
WITH {TRIPLES_SQL}
SELECT seg.o AS seg,
       CAST(COUNT(DISTINCT nat.o) AS BIGINT) AS n_nations,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM triples seg JOIN triples nat ON seg.s = nat.s
WHERE seg.p = 'inSegment' AND nat.p = 'inNation'
GROUP BY seg.o
""",
)
def q_sparql_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT ?nat) next to plain COUNT(*) in one grouped
    SELECT: distinct nations (and total customers) per market segment.
    The distinct aggregate is a hash-distinct inside the same
    grouped plan — no second pass over the joined bindings."""
    return compile_sparql_encoded(spark, sf_dir, _COUNT_DISTINCT_Q)


_IN_Q = """
SELECT ?c ?seg WHERE {
  ?c inSegment ?seg .
  FILTER(?seg IN ("BUILDING", "MACHINERY", "AUTOMOBILE"))
  FILTER(?seg NOT IN ("MACHINERY"))
}
"""


@register(
    "q_sparql_filter_in",
    oracle=f"""
WITH {TRIPLES_SQL}
SELECT s AS c, o AS seg FROM triples
WHERE p = 'inSegment'
  AND o IN ('BUILDING', 'MACHINERY', 'AUTOMOBILE')
  AND o NOT IN ('MACHINERY')
""",
)
def q_sparql_filter_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTER ?v IN (...) and FILTER ?v NOT IN (...) stacked: list
    membership lowers to Column.isin over the decoded terms — two
    scan-local predicates, no join, same shape as the VALUES
    lowering."""
    return compile_sparql_encoded(spark, sf_dir, _IN_Q)


_STRFN_Q = """
SELECT ?c ?nid ?renamed WHERE {
  ?c inNation ?nat .
  BIND(STRAFTER(?nat, ":") AS ?nid)
  BIND(REPLACE(?nat, "nation", "N") AS ?renamed)
  BIND(STRBEFORE(?nat, ":") AS ?kind)
  FILTER(?kind = "nation")
}
"""


@register(
    "q_sparql_str_functions",
    oracle=f"""
WITH {TRIPLES_SQL}
SELECT s AS c,
       CASE WHEN strpos(o, ':') > 0
            THEN substr(o, strpos(o, ':') + 1) ELSE '' END AS nid,
       regexp_replace(o, 'nation', 'N', 'g') AS renamed
FROM triples
WHERE p = 'inNation'
  AND CASE WHEN strpos(o, ':') > 0
           THEN substr(o, 1, strpos(o, ':') - 1) ELSE '' END = 'nation'
""",
)
def q_sparql_str_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRAFTER / STRBEFORE / REPLACE in BIND expressions: strip the
    'nation:' prefix off each customer's nation term and regex-rename
    it. REPLACE follows SPARQL 1.1 fn:replace (regex, replaces EVERY
    match — regexp_replace on both engines); STRBEFORE/STRAFTER return
    the empty string when the separator is absent, per spec."""
    return compile_sparql_encoded(spark, sf_dir, _STRFN_Q)


_STR_Q = """
SELECT ?node ?name WHERE {
  ?node hasName ?name .
  FILTER(STRSTARTS(?name, "A") || STRENDS(?name, "IA") ||
         CONTAINS(?name, "GER"))
}
"""


@register(
    "q_sparql_str_predicates",
    oracle=f"""
WITH {TRIPLES_SQL}
SELECT s AS node, o AS name FROM triples
WHERE p = 'hasName'
  AND (o LIKE 'A%' OR o LIKE '%IA' OR o LIKE '%GER%')
""",
)
def q_sparql_str_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRSTARTS / STRENDS / CONTAINS ||-folded in one FILTER over
    nation/region names — each lowers to the matching Column string
    predicate (startswith/endswith/contains), evaluated post-decode
    like REGEX but without regex-engine cost."""
    return compile_sparql_encoded(spark, sf_dir, _STR_Q)


# --- round 10 (VERDICT r9 #5): OPTIONAL over UNION ------------------

# customers and suppliers alternate into one member relation; the
# OPTIONAL segment binds for customers only (suppliers get NULL),
# composing over the WHOLE union group
_OPT_UNION_Q = """
SELECT ?m ?n ?seg WHERE {
  { ?m inSegment "BUILDING" . ?m inNation ?n }
  UNION
  { ?m inNation ?n }
  OPTIONAL { ?m inSegment ?seg }
}
"""


@register(
    "q_sparql_optional_union",
    oracle=f"""
WITH {TRIPLES_SQL},
branches AS (
  SELECT a.s AS m, a.o AS n
  FROM triples a JOIN triples b ON b.s = a.s
  WHERE a.p = 'inNation' AND b.p = 'inSegment' AND b.o = 'BUILDING'
  UNION ALL
  SELECT s, o FROM triples WHERE p = 'inNation')
SELECT br.m, br.n, seg.o AS seg
FROM branches br
LEFT JOIN triples seg ON seg.s = br.m AND seg.p = 'inSegment'
""",
)
def q_sparql_optional_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIONAL over a UNION group (round 10, VERDICT r9 #5):
    `{{A}} UNION {{B}} OPTIONAL {{C}}` compiles to
    leftjoin(union(A, B), C) — the OPTIONAL left-extends the WHOLE
    union's bag, not either branch (SPARQL 1.1 group semantics).
    Branch A = BUILDING customers with their nation; branch B = every
    inNation member (customers AND suppliers). The OPTIONAL segment
    binds for customers and stays NULL for suppliers, and BAG
    semantics hold: a BUILDING customer appears once per matching
    branch, each row left-extended independently."""
    return compile_sparql_encoded(spark, sf_dir, _OPT_UNION_Q)


_MINUS_UNION_Q = """
SELECT ?m ?n WHERE {
  { ?m inSegment ?n }
  UNION
  { ?m inNation ?n }
  MINUS { ?m inSegment "BUILDING" }
}
"""


@register(
    "q_sparql_minus_union",
    oracle=f"""
WITH {TRIPLES_SQL},
branches AS (
  SELECT s AS m, o AS n FROM triples WHERE p = 'inSegment'
  UNION ALL
  SELECT s, o FROM triples WHERE p = 'inNation')
SELECT m, n FROM branches br
WHERE NOT EXISTS (SELECT 1 FROM triples x
                  WHERE x.s = br.m AND x.p = 'inSegment'
                    AND x.o = 'BUILDING')
""",
)
def q_sparql_minus_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MINUS over a UNION group (round 10, the #5 twin): the union of
    branches compiles to one bound relation, then the shared-?m
    anti-join removes every binding compatible with a BUILDING-segment
    customer — minus(union(A, B), C), SPARQL 1.1 group semantics.
    Suppliers and non-BUILDING customers survive in BOTH branches'
    rows (bag preserved through the anti-join)."""
    return compile_sparql_encoded(spark, sf_dir, _MINUS_UNION_Q)


_GROUPBY_NOAGG_Q = """
SELECT ?n ?seg WHERE {
  ?c inNation ?n .
  ?c inSegment ?seg .
} GROUP BY ?n ?seg
"""


@register(
    "q_sparql_groupby_noagg",
    oracle=f"""
WITH {TRIPLES_SQL}
SELECT DISTINCT a.o AS n, b.o AS seg
FROM triples a JOIN triples b ON b.s = a.s
WHERE a.p = 'inNation' AND b.p = 'inSegment'
""",
)
def q_sparql_groupby_noagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY with NO aggregates (round 10 — a legal SPARQL 1.1 form
    rejected through round 9): one result row per (nation, segment)
    group, i.e. the distinct key combinations of the customer join.
    Lowered to a hash-distinct over the group keys — Spark plans the
    same partial/final aggregate pair as COUNT-style grouping, minus
    the aggregate buffers."""
    return compile_sparql_encoded(spark, sf_dir, _GROUPBY_NOAGG_Q)


_FROM_DEFAULT_Q = """
SELECT ?n (COUNT(*) AS ?members) (SAMPLE(?m) AS ?first_member)
FROM <g:supplier>
WHERE { ?m inNation ?n }
GROUP BY ?n
"""


@register(
    "q_sparql_from_default",
    oracle=f"""
WITH {QUADS_SQL}
SELECT o AS n, CAST(COUNT(*) AS BIGINT) AS members,
       MIN(s) AS first_member
FROM quads WHERE g = 'g:supplier' AND p = 'inNation'
GROUP BY o
""",
)
def q_sparql_from_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain `FROM <g:supplier>` (round 10 — the default-graph
    override rejected through round 9): the SAME inNation pattern as
    q_sparql_graph now ranges over the supplier graph as the DEFAULT
    graph — no GRAPH keyword in the pattern. Lowered as one broadcast
    semi-join restricting the encoded relation by subject-derived
    graph (quads_view's provenance rule), then the ordinary encoded
    aggregate pipeline."""
    return compile_sparql_encoded(spark, sf_dir, _FROM_DEFAULT_Q)
