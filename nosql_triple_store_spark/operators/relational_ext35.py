"""Thirty-fifth extension batch: deterministic training-shard layout
and a mergeable bottom-k quantile sketch.

Lineage: the two "last mile" primitives of an LLM training-data
pipeline (task brief). A 100 TB corpus ships to the trainer as a
manifest of fixed-count shards in a *deterministic pseudo-random*
order (reshuffling must be reproducible across reruns and engines),
and ingest monitoring wants quantiles of a measure column without a
global sort — a uniform bottom-k-by-hash sample is the classic
mergeable sketch (each partition keeps its k smallest tags; merging
keeps the k smallest of the union — associative, commutative, exact).

Both queries use an explicit 32-bit affine hash written in plain
BIGINT arithmetic so DuckDB computes the identical value and the
results are oracle-checked bit-for-bit (unlike xxhash64, which only
Spark has). The multiplier is Knuth's 2654435761 (odd ⇒ a bijection
mod 2^32); the pre-mod by 2^31 keeps the product under 2^63. At
full-corpus key widths (>2^31 ids) compose two rounds of the same
map — the algebra is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.textfns import TOKS_SQL, tokens_col
from ..registry import register

_N_SHARDS = 16
# affine 32-bit mix: h(key) = (key mod 2^31) * 2654435761 + 12345 mod 2^32
_HASH_SQL = (
    "CAST(((({key}) % 2147483648) * 2654435761 + 12345) % 4294967296"
    " AS BIGINT)"
)


@register(
    "q_train_shard_manifest",
    oracle=f"""
WITH d AS (
  SELECT doc_id, {_HASH_SQL.format(key='doc_id')} AS h,
         CAST(len({TOKS_SQL}) AS BIGINT) AS n_tokens,
         CAST(length(text) AS BIGINT) AS n_chars
  FROM documents)
SELECT CAST(h % {_N_SHARDS} AS BIGINT) AS shard_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars,
       MIN(h) AS min_h, MAX(h) AS max_h,
       ARG_MIN(doc_id, h) AS first_doc_id
FROM d GROUP BY 1
""",
)
def q_train_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-shard manifest: documents are assigned to
    {_N_SHARDS} shards by an explicit affine hash (reproducible
    "shuffle" — same doc always lands in the same shard, any engine);
    the manifest reports per-shard doc/token/char budgets plus the
    hash-order head (first_doc_id = the doc a reader streaming the
    shard in hash order sees first).

    Plan: one scan, the hash and whitespace-token count are codegen'd
    JVM expressions, one hash aggregation on shard_id — no sort, no
    window. At 100 TB the same query IS the writer's layout decision:
    `df.repartition(N, h).sortWithinPartitions(h).write` gives
    byte-identical shards on every rerun, which is what makes training
    jobs resumable and data ablations comparable. The affine map is a
    bijection mod 2^32, so distinct doc_ids < 2^31 get distinct tags
    and arg_min/min_by is tie-free (deterministic in both engines).
    """
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.expr(_HASH_SQL.format(key="doc_id")).alias("h"),
        F.size(tokens_col()).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars"),
    )
    return d.groupBy(
        (F.col("h") % _N_SHARDS).cast("long").alias("shard_id")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.sum("n_chars").alias("n_chars"),
        F.min("h").alias("min_h"),
        F.max("h").alias("max_h"),
        F.min_by("doc_id", "h").alias("first_doc_id"),
    )


_SKETCH_K = 1000
_QS = (25, 50, 75, 90, 99)  # percentiles, integer to keep names exact


@register(
    "q_agg_bottomk_quantile",
    oracle=f"""
WITH keyed AS (
  SELECT l_extendedprice AS price,
         {_HASH_SQL.format(key='l_orderkey * 8 + l_linenumber')} AS h
  FROM lineitem),
sample AS (
  SELECT price, h FROM keyed ORDER BY h LIMIT {_SKETCH_K}),
ranked AS (
  SELECT price, row_number() OVER (ORDER BY price, h) AS rn,
         COUNT(*) OVER () AS k
  FROM sample)
SELECT CAST(g.pct AS BIGINT) AS pct, r.price AS estimate
FROM (SELECT unnest(ARRAY{list(_QS)}) AS pct) g
JOIN ranked r ON r.rn = (g.pct * (r.k - 1)) // 100 + 1
""",
)
def q_agg_bottomk_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile estimates from a mergeable bottom-k uniform sample:
    tag every row with the affine hash, keep the {_SKETCH_K} smallest
    tags (an exact uniform sample without replacement, since the hash
    is a fixed bijection), and read percentiles off the sorted sample.

    The sketch property is what matters at 100 TB: "k smallest tags"
    is associative — each partition computes its local bottom-k, merges
    keep the bottom-k of unions — so Spark plans it as TakeOrdered
    (per-partition partial top-k, one tiny merge), never a global sort.
    Unlike approx_percentile (q_agg_approx_percentile, whose KLL merge
    is engine-specific and therefore rows-only), this sketch is
    bit-reproducible across engines, so the estimates oracle-check
    exactly. Accuracy ~ O(1/sqrt(k)) in rank: error-bound-tested vs the
    exact percentiles in tests/test_ext35.py.

    The in-sample ranking window is a single partition over exactly k
    rows (bounded by the sketch parameter, not the data) — the
    SCALE.md exemption for windows over aggregated/bounded frames.
    """
    li = load_table(spark, sf_dir, "lineitem")
    keyed = li.select(
        F.col("l_extendedprice").alias("price"),
        F.expr(
            _HASH_SQL.format(key="l_orderkey * 8 + l_linenumber")
        ).alias("h"),
    )
    sample = keyed.orderBy("h").limit(_SKETCH_K)
    w = Window.orderBy("price", "h")
    ranked = sample.select(
        "price",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(
            Window.partitionBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("k"),
    )
    pcts = spark.range(0, len(_QS)).select(
        F.element_at(
            F.array(*[F.lit(q) for q in _QS]), (F.col("id") + 1).cast("int")
        ).cast("long").alias("pct")
    )
    return (
        ranked.join(
            F.broadcast(pcts),
            F.expr("rn = pct * (k - 1) div 100 + 1"),
        )
        .select("pct", F.col("price").alias("estimate"))
    )
