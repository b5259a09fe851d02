"""Dictionary encoding for triple terms (S2RDF §4 / every serious RDF
engine): long IRI/literal strings become integer ids, shrinking shuffle
and storage width for the self-join-heavy BGP workload — joins on 8-byte
longs instead of variable-width strings.

Two id schemes:
- 'dense': contiguous ids by sorted term (row_number over a global sort).
  Best compression + range-joinable; the global sort is fine while the
  dictionary (distinct terms) is orders of magnitude smaller than the
  triples — YAGO: 2.4M subjects vs 10.2M triples (SURVEY §6).
- 'hash': xxhash64(term) — embarrassingly parallel, no sort, stable under
  dictionary growth; 64-bit collisions are checked and rejected loudly
  (birthday bound: ~50% at 5e9 terms, so verification is mandatory, not
  paranoia).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def build_dictionary(triples: DataFrame, ids: str = "dense") -> DataFrame:
    """(term_id long, term string) over all distinct s/p/o terms."""
    terms = (
        triples.select(F.col("s").alias("term"))
        .union(triples.select("p"))
        .union(triples.select("o"))
        .distinct()
    )
    if ids == "dense":
        w = Window.orderBy("term")
        return terms.select(
            F.row_number().over(w).cast("long").alias("term_id"), "term"
        )
    if ids == "hash":
        d = terms.select(F.xxhash64("term").alias("term_id"), "term")
        collisions = (
            d.groupBy("term_id").count().filter(F.col("count") > 1).count()
        )
        if collisions:
            raise RuntimeError(
                f"{collisions} xxhash64 collisions in dictionary; "
                "use ids='dense'"
            )
        return d
    raise ValueError(f"unknown id scheme: {ids!r}")


def encode_triples(triples: DataFrame, dictionary: DataFrame) -> DataFrame:
    """(s,p,o) strings -> (s_id, p_id, o_id) longs via three dictionary
    joins. The dictionary is broadcast when small; at scale, sort both
    sides by term once and the three joins share the shuffle."""
    d = dictionary
    out = triples
    for col in ("s", "p", "o"):
        dd = d.select(
            F.col("term").alias(col), F.col("term_id").alias(f"{col}_id")
        )
        out = out.join(F.broadcast(dd), col, "inner")
    return out.select("s_id", "p_id", "o_id")


def decode_triples(encoded: DataFrame, dictionary: DataFrame) -> DataFrame:
    d = dictionary
    out = encoded
    for col in ("s", "p", "o"):
        dd = d.select(
            F.col("term_id").alias(f"{col}_id"), F.col("term").alias(col)
        )
        out = out.join(F.broadcast(dd), f"{col}_id", "inner")
    return out.select("s", "p", "o")
