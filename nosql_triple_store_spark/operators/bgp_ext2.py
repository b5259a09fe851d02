"""SPARQL CONSTRUCT and shingle-containment — closing out the SPARQL 1.1
surface and the asymmetric near-dup case."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.bgp import TRIPLES_SQL, triples_view
from ..registry import register
from .dedup import _NEAR_ORACLE


@register(
    "q_bgp_construct",
    oracle=f"""
WITH {TRIPLES_SQL}
SELECT c.s AS s, 'inRegionName' AS p, r.o AS o
FROM triples c
JOIN triples n ON c.o = n.s
JOIN triples r ON n.o = r.s
WHERE c.p = 'inNation' AND n.p = 'inRegion' AND r.p = 'hasName'
  AND c.s LIKE 'customer:%'
""",
)
def q_bgp_construct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL CONSTRUCT: derive NEW triples from a matched pattern —
    `CONSTRUCT {{ ?c :inRegionName ?name }} WHERE {{ ?c inNation ?n .
    ?n inRegion ?r . ?r hasName ?name }}` — the materialized-inference
    step RDF pipelines use to flatten hierarchies. The derived relation
    is just the BGP join projected back into (s, p, o) shape, so it can
    be unioned with the base triples and queried by the same BGP
    compiler (composability is the point)."""
    t = triples_view(spark, sf_dir)
    c = t.filter(
        (F.col("p") == "inNation") & F.col("s").startswith("customer:")
    ).select(F.col("s").alias("cust"), F.col("o").alias("nat"))
    n = t.filter(F.col("p") == "inRegion").select(
        F.col("s").alias("nat"), F.col("o").alias("reg")
    )
    r = t.filter(F.col("p") == "hasName").select(
        F.col("s").alias("reg"), F.col("o").alias("name")
    )
    return (
        c.join(n, "nat")
        .join(r, "reg")
        .select(
            F.col("cust").alias("s"),
            F.lit("inRegionName").alias("p"),
            F.col("name").alias("o"),
        )
    )


_CONTAIN_ORACLE = _NEAR_ORACLE.replace(
    """SELECT doc_a, doc_b,
       ROUND(common * 1.0 / (sa.n_sh + sb.n_sh - common), 4) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
ORDER BY common * 1.0 / (sa.n_sh + sb.n_sh - common) DESC, doc_a, doc_b
LIMIT 50""",
    """SELECT doc_a, doc_b,
       ROUND(common * 1.0 / LEAST(sa.n_sh, sb.n_sh), 4) AS containment
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE sa.n_sh >= 10 AND sb.n_sh >= 10
ORDER BY common * 1.0 / LEAST(sa.n_sh, sb.n_sh) DESC, doc_a, doc_b
LIMIT 50""",
)


@register("q_text_containment", oracle=_CONTAIN_ORACLE)
def q_text_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle CONTAINMENT (|A∩B| / min(|A|,|B|)) — the asymmetric
    near-dup measure: a short document quoted inside a long one scores
    ~1.0 here but low Jaccard (the union washes it out). Round 9: pairs
    come from the adaptive prefix-filter ladder (dedup_prefix.py,
    smaller-side prefix vs full index — the exact containment-join
    scheme), not the quadratic `_shingle_pairs` layout; min-size floor
    of 10 shingles keeps trivially-tiny docs from saturating the top-k.
    Ratio of exact ints — bit-identical ordering cross-engine."""
    from .dedup_prefix import containment_threshold_pairs, top_pairs_ladder

    pairs = top_pairs_ladder(
        lambda p, q: containment_threshold_pairs(spark, sf_dir, p, q, 10), 50
    )
    cont = F.col("common") * 1.0 / F.least("na", "nb")
    return (
        pairs.filter((F.col("na") >= 10) & (F.col("nb") >= 10))
        .select(
            "doc_a", "doc_b",
            cont.alias("_c"), F.round(cont, 4).alias("containment"),
        )
        .orderBy(F.desc("_c"), "doc_a", "doc_b")
        .limit(50)
        .select("doc_a", "doc_b", "containment")
    )


@register(
    "q_bgp_ask",
    oracle=f"""
WITH {TRIPLES_SQL}
SELECT CAST(EXISTS (
  SELECT 1 FROM triples n JOIN triples r ON n.o = r.s
  WHERE n.p = 'inRegion' AND r.p = 'hasName' AND r.o = 'ASIA'
) AS BIGINT) AS answer
""",
)
def q_bgp_ask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL ASK: does any nation sit in the region named ASIA? —
    boolean existence of a pattern match. Planned as the pattern join
    under a LIMIT 1 (Spark stops scanning at the first match; at scale
    the limit propagates into the scan), emitted as one 0/1 row."""
    t = triples_view(spark, sf_dir)
    n = t.filter(F.col("p") == "inRegion").select(F.col("o").alias("reg"))
    r = t.filter((F.col("p") == "hasName") & (F.col("o") == "ASIA")).select(
        F.col("s").alias("reg")
    )
    hit = n.join(r, "reg").limit(1)
    return hit.agg(
        F.when(F.count(F.lit(1)) > 0, 1).otherwise(0).cast("long").alias("answer")
    )


@register(
    "q_bgp_describe",
    oracle=f"""
WITH {TRIPLES_SQL}
SELECT s, p, o FROM triples WHERE s = 'nation:7'
UNION ALL
SELECT s, p, o FROM triples WHERE o = 'nation:7'
""",
)
def q_bgp_describe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL DESCRIBE <nation:7>: every triple where the resource is
    subject or object — the resource's full neighborhood. Two
    predicate-pushed scans of the triples relation, unioned; with the
    predicate-partitioned layout (sources) each side prunes to the
    partitions that can contain the term."""
    t = triples_view(spark, sf_dir)
    return t.filter(F.col("s") == "nation:7").unionAll(
        t.filter(F.col("o") == "nation:7")
    )
