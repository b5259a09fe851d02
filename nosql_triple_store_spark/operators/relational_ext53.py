"""Fifty-third extension batch: normalize-then-dedup, observed
metrics, and an Arrow-native kernel.

Lineage: C4/RefinedWeb dedup normalizes text BEFORE hashing (case,
punctuation, and whitespace variants are the same document);
`DataFrame.observe` is Spark's zero-cost accumulator channel for
data-quality counters that would otherwise need a second scan; and
`mapInArrow` is the lowest-overhead Python extension point (raw
RecordBatches, no pandas conversion) — the right tool when the kernel
is pure Arrow/numpy compute. Each was an uncovered engine surface.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.textfns import TOKS_SQL
from ..registry import register

_NORM_RE = "[^a-z0-9 ]"


@register(
    "q_dedup_normalized",
    oracle=f"""
WITH n AS (
  SELECT doc_id,
         trim(regexp_replace(
              regexp_replace(lower(text), '{_NORM_RE}', '', 'g'),
              ' +', ' ', 'g')) AS norm
  FROM documents),
cl AS (
  SELECT norm, CAST(COUNT(*) AS BIGINT) AS sz FROM n GROUP BY norm)
SELECT CAST(COUNT(*) AS BIGINT) AS n_distinct_norm,
       CAST(SUM(sz) AS BIGINT) AS n_docs,
       CAST(SUM(sz - 1) AS BIGINT) AS n_redundant_docs,
       CAST(MAX(sz) AS BIGINT) AS largest_cluster
FROM cl
""",
)
def q_dedup_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalize-then-exact-dedup census (the C4 recipe): lowercase,
    strip non-alphanumerics, collapse runs of spaces, trim — then
    group identical canonical forms. Case/punctuation/whitespace
    variants of one document collapse into one cluster, which raw
    exact dedup (q_dedup_exact) misses; n_redundant_docs is what the
    cleaner would drop. Both engines run the same two regex rewrites.

    Scale: one scan with codegen'd string expressions, one hash
    aggregation keyed by the normalized form (in production, by its
    xxhash64 — grouping by a 64-bit key instead of full text is the
    same plan with a narrower shuffle).
    """
    docs = load_table(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), _NORM_RE, ""),
            " +",
            " ",
        )
    )
    cl = docs.select(norm.alias("norm")).groupBy("norm").agg(
        F.count(F.lit(1)).alias("sz")
    )
    return cl.agg(
        F.count(F.lit(1)).alias("n_distinct_norm"),
        F.sum("sz").alias("n_docs"),
        F.sum(F.col("sz") - 1).alias("n_redundant_docs"),
        F.max("sz").alias("largest_cluster"),
    )


@register(
    "q_meta_observe_metrics",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_returns,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS cents
FROM lineitem
""",
)
def q_meta_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality counters via `DataFrame.observe`: the scan that a
    downstream job runs anyway carries named aggregate observations
    (row count, return-flag count, exact money total) collected by the
    listener channel at zero extra passes — Spark's native answer to
    'count the nulls without a second job'. The observed values are
    returned as a one-row DataFrame and oracle-checked against the
    direct aggregation, proving the channel loses nothing.

    Scale: observe() piggybacks accumulators on the existing physical
    plan — no shuffle, no extra scan; the pattern attaches to ANY
    query's scan at 100 TB for free quality telemetry.
    """
    li = load_table(spark, sf_dir, "lineitem")
    obs = Observation("quality")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
        ).alias("n_returns"),
        F.sum(
            F.round(F.col("l_extendedprice") * 100).cast("long")
        ).alias("cents"),
    )
    # run the carrying job (any consumer works; count() is the cheapest)
    observed.count()
    got = obs.get
    return spark.createDataFrame(
        [
            (
                int(got["n_rows"]),
                int(got["n_returns"]),
                int(got["cents"]),
            )
        ],
        "n_rows long, n_returns long, cents long",
    )


@register(
    "q_text_arrow_token_census",
    oracle=f"""
SELECT doc_id, CAST(len({TOKS_SQL}) AS BIGINT) AS n_tokens
FROM documents
""",
)
def q_text_arrow_token_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc token counts computed in a `mapInArrow` kernel — raw
    pyarrow RecordBatches in, no pandas conversion: split on spaces
    with Arrow's vectorized split_pattern, drop empties with a flat
    mask, and re-segment counts per row with one bincount over the
    list parent indices. Matches the engine's whitespace-token
    contract (TOKS_SQL) exactly, proving the Arrow-native path agrees
    with the JVM path bit-for-bit.

    Scale: mapInArrow is the lowest-overhead Python extension point
    (zero-copy Arrow buffers, no pandas materialization) — the right
    tier for kernels that are pure columnar compute; one batch in, one
    batch out, no shuffle.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            text = pc.utf8_lower(batch.column(1))
            parts = pc.split_pattern(text, " ")
            flat = pc.list_flatten(parts)
            parents = pc.list_parent_indices(parts)
            mask = pc.not_equal(flat, "")
            kept = parents.filter(mask).to_numpy(zero_copy_only=False)
            counts = np.bincount(kept, minlength=batch.num_rows)
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(0),
                    pa.array(counts.astype("int64")),
                ],
                names=["doc_id", "n_tokens"],
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInArrow(kernel, schema="doc_id long, n_tokens long")
