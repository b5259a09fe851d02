"""Data-quality operators: declarative constraint validation (the
expectations/contract check every production ingest runs — Great
Expectations / Delta constraints territory) and Unicode NFC text
normalization (the first text-cleaning kernel of an LLM corpus build).

Reference lineage: the reference trusts its TSV loader blindly
(SURVEY §2.A R19 — no validation anywhere); these are the checks a
Spark-native ingest adds in front of the same load path."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from ..catalog import load_table
from ..registry import register

_VALIDATE_ORACLE = """
SELECT * FROM (
  SELECT 'domain_orderstatus' AS check_name,
         CAST(COUNT(*) FILTER (WHERE o_orderstatus NOT IN ('F','O','P'))
              AS BIGINT) AS violations
  FROM orders
  UNION ALL
  SELECT 'fk_orders_customer',
         CAST(COUNT(*) AS BIGINT)
  FROM orders o WHERE NOT EXISTS (
    SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
  UNION ALL
  SELECT 'notnull_lineitem_quantity',
         CAST(COUNT(*) FILTER (WHERE l_quantity IS NULL) AS BIGINT)
  FROM lineitem
  UNION ALL
  SELECT 'pk_orders_unique',
         CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'range_lineitem_discount',
         CAST(COUNT(*) FILTER (WHERE l_discount < 0 OR l_discount > 0.1)
              AS BIGINT)
  FROM lineitem
)
"""


@register("q_validate_constraints", oracle=_VALIDATE_ORACLE)
def q_validate_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-contract validation in one report: primary-key uniqueness,
    referential integrity (anti join — never a driver-side existence
    loop), not-null, value domain, and numeric range, each as one
    partial-aggregable count. Every check is a separate aggregate over
    its own scan with column pruning (the FK anti join broadcasts the
    key side); a violations row of 0 is the PASS record, so the report
    shape is stable whether or not the data is clean. At 100 TB this is
    the pre-ingest gate run per partition-batch, not per table."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    customer = load_table(spark, sf_dir, "customer")

    def row(name: str, agg: DataFrame) -> DataFrame:
        return agg.select(
            F.lit(name).alias("check_name"),
            F.col("v").cast("long").alias("violations"),
        )

    checks = [
        row(
            "pk_orders_unique",
            orders.agg(
                (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("v")
            ),
        ),
        row(
            "fk_orders_customer",
            orders.join(
                F.broadcast(customer.select("c_custkey")),
                orders["o_custkey"] == customer["c_custkey"],
                "left_anti",
            ).agg(F.count(F.lit(1)).alias("v")),
        ),
        row(
            "notnull_lineitem_quantity",
            lineitem.agg(
                F.count_if(F.col("l_quantity").isNull()).alias("v")
            ),
        ),
        row(
            "domain_orderstatus",
            orders.agg(
                F.count_if(
                    ~F.col("o_orderstatus").isin("F", "O", "P")
                ).alias("v")
            ),
        ),
        row(
            "range_lineitem_discount",
            lineitem.agg(
                F.count_if(
                    (F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)
                ).alias("v")
            ),
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


@F.pandas_udf(StringType())  # DataType object: a DDL string here would
def _nfc_normalize(s: pd.Series) -> pd.Series:  # need a live SparkContext
    """Arrow-batched NFC normalization (no row-at-a-time Python UDF);
    unicodedata is stdlib, so executors need no extra packages."""
    import unicodedata

    return s.map(lambda x: unicodedata.normalize("NFC", x))


_NORMALIZE_ORACLE = """
WITH raw AS (
  SELECT doc_id, 'e' || chr(769) || ':' || text AS s FROM documents),
n AS (
  SELECT doc_id, s, nfc_normalize(s) AS norm FROM raw)
SELECT doc_id,
       CAST(length(s) AS BIGINT) AS chars_before,
       CAST(length(norm) AS BIGINT) AS chars_after,
       CAST(s <> norm AS BIGINT) AS changed,
       md5(norm) AS norm_md5
FROM n
"""


@register("q_text_normalize", oracle=_NORMALIZE_ORACLE)
def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization as a corpus-cleaning kernel,
    differentially tested against DuckDB's independent nfc_normalize:
    each document is prefixed with a decomposed 'e'+COMBINING-ACUTE
    sequence (so the normalization is guaranteed non-trivial — NFC
    composes it to one codepoint), normalized via an Arrow-batched
    pandas UDF over Python's unicodedata, and fingerprinted. Character
    counts before/after and the md5 of the normalized text must match
    across two unrelated NFC implementations (ICU-style vs CPython's
    unicodedata) — a real cross-engine equivalence, not a self-check.
    100 TB shape: one narrow mapPartitions-free projection, Arrow both
    directions, no shuffle at all."""
    docs = load_table(spark, sf_dir, "documents")
    # the prefix is the DECOMPOSED pair e + U+0301 via explicit escape —
    # a precomposed source literal would make normalization a no-op
    raw = docs.select(
        "doc_id", F.concat(F.lit("e\u0301:"), F.col("text")).alias("s")
    )
    n = raw.withColumn("norm", _nfc_normalize("s"))
    return n.select(
        "doc_id",
        F.length("s").cast("long").alias("chars_before"),
        F.length("norm").cast("long").alias("chars_after"),
        (F.col("s") != F.col("norm")).cast("long").alias("changed"),
        F.md5(F.encode("norm", "UTF-8")).alias("norm_md5"),
    )
