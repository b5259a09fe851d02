"""Twentieth extension batch: per-user entropy, Gini concentration,
order seasonality, schema-drift union, weighted deterministic sampling.

Float discipline (continues ext19's exact-float program): Gini and
seasonality reduce to exact-integer numerators/denominators with one
final division (bit-identical); the weighted sampler never compares
floats at all — it compares md5 hex strings against a per-row hex
threshold. Entropy is the boundary case: its terms are exact and fold
in sorted order, but ln() differs between Java and C libm at the last
ulp, so it alone rounds (6dp) — see its docstring."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.prefix import bucketed_row_number
from ..registry import register
from .triple import E_CTE

_ENTROPY_ORACLE = f"""
{E_CTE},
cnt AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM e GROUP BY user_id, event_type),
tot AS (
  SELECT user_id, CAST(SUM(n) AS BIGINT) AS nt,
         CAST(COUNT(*) AS BIGINT) AS n_types,
         list(n ORDER BY event_type) AS ns
  FROM cnt GROUP BY user_id)
SELECT user_id, n_types,
       ROUND(list_sum([-(x / nt) * ln(x / nt) for x in
                 [CAST(y AS DOUBLE) for y in ns]]), 6) AS entropy
FROM tot
"""


@register("q_events_entropy", oracle=_ENTROPY_ORACLE)
def q_events_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each user's event-type distribution — the
    behavioral-diversity feature (bot traffic ≈ 0, organic ≈ ln 5).
    Terms derive from exact integer pairs and fold in event-type-sorted
    order in both engines — but ln() itself is NOT cross-engine
    bit-stable (Java Math.log vs C libm disagree at the last ulp for
    some inputs; found live at sf0.01 after sf0.001 passed unrounded),
    so the result rounds at 6dp — wide enough to absorb ulp noise,
    fine enough that the feature is unchanged. Transcendentals break
    the exact-float program that pure +,×,÷,√ expressions (q_agg_gini,
    q_vector_stats) satisfy. Two partial-aggregable groupBys, then
    array math on one row per user."""
    ev = load_table(spark, sf_dir, "events")
    cnt = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = cnt.groupBy("user_id").agg(
        F.sum("n").alias("nt"),
        F.count(F.lit(1)).alias("n_types"),
        F.array_sort(F.collect_list(F.struct("event_type", "n"))).alias("es"),
    )
    p = lambda x: x["n"].cast("double") / F.col("nt")  # noqa: E731
    return tot.select(
        "user_id",
        "n_types",
        F.round(
            F.aggregate(
                "es", F.lit(0.0), lambda acc, x: acc - p(x) * F.log(p(x))
            ),
            6,
        ).alias("entropy"),
    )


_GINI_ORACLE = """
WITH per_cust AS (
  SELECT o_custkey,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY o_custkey),
ranked AS (
  SELECT cents,
         row_number() OVER (ORDER BY cents, o_custkey) AS i,
         COUNT(*) OVER () AS n
  FROM per_cust),
s AS (
  SELECT CAST(MAX(n) AS BIGINT) AS n,
         CAST(SUM((2 * i - n - 1) * cents) AS BIGINT) AS num,
         CAST(SUM(cents) AS BIGINT) AS tot
  FROM ranked)
SELECT n AS n_customers,
       CAST(num AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(tot AS DOUBLE))
         AS gini
FROM s
"""


@register("q_agg_gini", oracle=_GINI_ORACLE)
def q_agg_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue concentration — the
    inequality metric behind 'what fraction of revenue is the top 1%'.
    Revenue lands in exact integer cents, the rank index comes from a
    (cents, custkey)-ordered row_number, and Σ(2i−n−1)·xᵢ stays in
    exact int64 (< 2^53, lossless double cast) — ONE final division is
    the only float op, bit-identical cross-engine. The (cents, custkey)
    rank comes from functions/prefix.bucketed_row_number — bucket-
    parallel, no single-partition window over the per-customer rows —
    and n is a broadcast scalar count, not a count-over-window."""
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    n_tot = per_cust.agg(F.count(F.lit(1)).alias("n"))
    ranked = bucketed_row_number(
        per_cust, "cents", tiebreaks=("o_custkey",), out_col="i"
    ).crossJoin(F.broadcast(n_tot)).select("cents", "i", "n")
    s = ranked.agg(
        F.max("n").alias("n"),
        F.sum((2 * F.col("i") - F.col("n") - 1) * F.col("cents")).alias("num"),
        F.sum("cents").alias("tot"),
    )
    return s.select(
        F.col("n").alias("n_customers"),
        (
            F.col("num").cast("double")
            / (F.col("n").cast("double") * F.col("tot").cast("double"))
        ).alias("gini"),
    )


_SEASON_ORACLE = """
WITH m AS (
  SELECT CAST(month(o_orderdate) AS BIGINT) AS month,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY month(o_orderdate)),
tot AS (
  SELECT CAST(SUM(n_orders) AS BIGINT) AS n_all,
         CAST(SUM(cents) AS BIGINT) AS cents_all
  FROM m)
SELECT month, n_orders,
       (CAST(cents AS DOUBLE) * CAST(n_all AS DOUBLE))
         / (CAST(n_orders AS DOUBLE) * CAST(cents_all AS DOUBLE))
         AS seasonal_idx
FROM m, tot
"""


@register("q_orders_seasonality", oracle=_SEASON_ORACLE)
def q_orders_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-of-year seasonality index of average order value: the
    per-month mean relative to the global mean, computed as a ratio of
    exact integer-cents products (cents_m·n_all)/(n_m·cents_all) — one
    double division of lossless-cast int64s, bit-identical cross-engine
    (at sf≥1 the products approach 2^53: switch the sums to DECIMAL as
    q_agg_decimal_exact does). Orders span 6.5 years, so every month
    bucket aggregates multiple years — a real seasonal profile, one
    partial-aggregable groupBy + a broadcast of the 1-row total."""
    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(F.month("o_orderdate").cast("long").alias("month")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"),
    )
    tot = m.agg(
        F.sum("n_orders").alias("n_all"), F.sum("cents").alias("cents_all")
    )
    return m.crossJoin(F.broadcast(tot)).select(
        "month",
        "n_orders",
        (
            (F.col("cents").cast("double") * F.col("n_all").cast("double"))
            / (
                F.col("n_orders").cast("double")
                * F.col("cents_all").cast("double")
            )
        ).alias("seasonal_idx"),
    )


_DRIFT_SPLIT = 250

_UNION_ORACLE = f"""
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(CASE WHEN doc_id >= {_DRIFT_SPLIT} THEN n_chars END)
            AS BIGINT) AS n_with_chars,
       CAST(SUM(CASE WHEN doc_id >= {_DRIFT_SPLIT} THEN n_chars END)
            AS BIGINT) AS chars_sum
FROM documents GROUP BY lang
"""


@register("q_union_schema_drift", oracle=_UNION_ORACLE)
def q_union_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-side schema-drift union: an old extract carries (doc_id,
    lang), a newer one adds n_chars; unionByName with
    allowMissingColumns=True aligns by NAME and surfaces NULL for the
    missing column (positional union would silently mis-bind columns —
    the classic drift bug). Null-skipping aggregates then separate
    known from unknown. The in-engine twin of q_schema_evolution's
    file-level mergeSchema."""
    docs = load_table(spark, sf_dir, "documents")
    v1 = docs.filter(F.col("doc_id") < _DRIFT_SPLIT).select("doc_id", "lang")
    v2 = docs.filter(F.col("doc_id") >= _DRIFT_SPLIT).select(
        "doc_id", "lang", "n_chars"
    )
    merged = v1.unionByName(v2, allowMissingColumns=True)
    return merged.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count("n_chars").alias("n_with_chars"),
        F.sum("n_chars").alias("chars_sum"),
    )


_WSAMPLE_ORACLE = """
WITH w AS (
  SELECT o_orderkey, o_totalprice,
         (SELECT MAX(o_totalprice) FROM orders) AS wmax
  FROM orders),
t AS (
  SELECT o_orderkey, o_totalprice,
         lpad(lower(hex(CAST(FLOOR(4294967296.0 * o_totalprice / wmax)
                             AS BIGINT))), 8, '0') AS thr
  FROM w)
SELECT o_orderkey, o_totalprice
FROM t
WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8) < thr
"""


@register("q_sample_weighted", oracle=_WSAMPLE_ORACLE)
def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted deterministic sampling: each order is kept with
    probability proportional to its price — the importance-sampling
    primitive for training-data mixing — decided by comparing the md5
    hex prefix of the KEY against a per-row hex threshold derived from
    the weight. No engine RNG, no float comparison (hex strings only:
    the one float op, floor(2³²·w/wmax), is a single identical
    expression), so the SAME rows are chosen on any engine, any
    partitioning, any run — reproducibility q_sample_deterministic
    gives uniformly, extended to weights."""
    orders = load_table(spark, sf_dir, "orders")
    wmax = orders.agg(F.max("o_totalprice").alias("wmax"))
    t = orders.crossJoin(F.broadcast(wmax)).select(
        "o_orderkey",
        "o_totalprice",
        F.lpad(
            F.lower(
                F.hex(
                    F.floor(
                        F.lit(4294967296.0)
                        * F.col("o_totalprice")
                        / F.col("wmax")
                    ).cast("long")
                )
            ),
            8,
            "0",
        ).alias("thr"),
    )
    return t.filter(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8)
        < F.col("thr")
    ).select("o_orderkey", "o_totalprice")
