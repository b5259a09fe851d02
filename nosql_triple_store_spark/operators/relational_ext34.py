"""Thirty-fourth extension batch: customer-lifetime cohort analysis,
multi-touch attribution, a-priori frequent itemsets, and interpolated
as-of joins.

Lineage: the four canonical "product analytics over the event/order log"
workloads a warehouse user of the reference (triples re-expressed as
fact tables, SURVEY §2.C) runs daily. Each is expressed as pure
DataFrame ops — the only windows are over *aggregated* frames (per
cohort: ≤ 32 age rows) or per-user event streams (bounded by a user's
own activity), never a global single-partition order (SCALE.md pattern
notes).

Money is summed in exact integer cents (``ROUND(price*100)`` is the
same IEEE double product and half-away rounding in both engines), so
every revenue aggregate hash-matches the DuckDB oracle bit-for-bit; the
one float division per output row happens after all aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .triple import E_CTE
from ..materialize import materialize

# year*4 + zero-based quarter: a dense integer quarter index whose
# differences are "age in quarters" — identical arithmetic both engines
# (integer division spells `//` in DuckDB, `div` in Spark SQL).
_YQ_SQL = "CAST(year({c}) * 4 + (month({c}) - 1) // 3 AS BIGINT)"
_YQ_SPARK = "CAST(year({c}) * 4 + (month({c}) - 1) div 3 AS BIGINT)"
_CENTS_SQL = "CAST(ROUND(o_totalprice * 100) AS BIGINT)"


@register(
    "q_orders_cohort_ltv",
    oracle=f"""
WITH o AS (
  SELECT o_custkey, {_YQ_SQL.format(c='o_orderdate')} AS yq,
         {_CENTS_SQL} AS cents
  FROM orders),
first_q AS (
  SELECT o_custkey, MIN(yq) AS cohort_yq FROM o GROUP BY o_custkey),
cohort AS (
  SELECT f.cohort_yq, o.yq - f.cohort_yq AS age_q,
         o.o_custkey, o.cents
  FROM o JOIN first_q f ON o.o_custkey = f.o_custkey),
agg AS (
  SELECT cohort_yq, age_q,
         CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
         CAST(SUM(cents) AS BIGINT) AS cents
  FROM cohort GROUP BY 1, 2)
SELECT CAST(cohort_yq // 4 AS BIGINT) AS cohort_year,
       CAST(cohort_yq % 4 + 1 AS BIGINT) AS cohort_quarter,
       age_q, n_customers,
       ROUND(cents / 100.0, 2) AS revenue,
       ROUND(SUM(cents) OVER (PARTITION BY cohort_yq ORDER BY age_q)
             / 100.0, 2) AS cum_revenue
FROM agg
""",
)
def q_orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value matrix: customers cohorted by the quarter
    of their FIRST order; per (cohort, age-in-quarters) the active
    customer count, revenue, and cumulative (lifetime-to-date) revenue.

    Scale: the first-order lookup is a self-aggregation joined back on
    o_custkey — both sides hash-partition on the same key, so AQE plans
    one co-partitioned shuffle (no broadcast of a customer-cardinality
    dim needed). The cumulative window partitions by cohort over the
    *aggregated* matrix (≤ #quarters² rows total, ~28 per cohort here) —
    never over raw orders. Cents are exact ints so the running sum is
    associative and bit-stable under any merge order.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr(_YQ_SPARK.format(c="o_orderdate")).alias("yq"),
        F.expr(_CENTS_SQL).alias("cents"),
    )
    first_q = o.groupBy("o_custkey").agg(F.min("yq").alias("cohort_yq"))
    cohort = o.join(first_q, "o_custkey").select(
        "cohort_yq", (F.col("yq") - F.col("cohort_yq")).alias("age_q"),
        "o_custkey", "cents",
    )
    agg = cohort.groupBy("cohort_yq", "age_q").agg(
        F.count_distinct("o_custkey").alias("n_customers"),
        F.sum("cents").alias("cents"),
    )
    w = Window.partitionBy("cohort_yq").orderBy("age_q")
    return agg.select(
        (F.col("cohort_yq") / 4).cast("long").alias("cohort_year"),
        (F.col("cohort_yq") % 4 + 1).cast("long").alias("cohort_quarter"),
        "age_q", "n_customers",
        F.round(F.col("cents") / 100.0, 2).alias("revenue"),
        F.round(F.sum("cents").over(w) / 100.0, 2).alias("cum_revenue"),
    )


_TOUCH_TYPES = "('click', 'view', 'signup')"
_LOOKBACK_US = 7 * 86_400 * 1_000_000  # 7-day attribution window


@register(
    "q_attribution_linear",
    oracle=f"""
{E_CTE},
conv AS (
  SELECT event_id AS conv_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS cts
  FROM e WHERE event_type = 'purchase'),
touch AS (
  SELECT user_id, event_type AS channel, CAST(epoch_us(ts) AS BIGINT) AS tts
  FROM e WHERE event_type IN {_TOUCH_TYPES}),
pairs AS (
  SELECT c.conv_id, t.channel
  FROM conv c JOIN touch t
    ON c.user_id = t.user_id
   AND t.tts <= c.cts AND t.tts > c.cts - {_LOOKBACK_US}),
k AS (
  SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS k FROM pairs GROUP BY conv_id)
SELECT p.channel,
       CAST(COUNT(*) AS BIGINT) AS n_touches,
       CAST(COUNT(DISTINCT p.conv_id) AS BIGINT) AS n_conversions,
       ROUND(SUM(1.0 / k.k), 4) AS credit
FROM pairs p JOIN k ON p.conv_id = k.conv_id
GROUP BY p.channel
""",
)
def q_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: every purchase splits one unit of
    credit equally across the user's touch events (click/view/signup) in
    the trailing 7 days; report per-channel touch count, reached
    conversions, and total fractional credit.

    Complements q_first_touch (single-touch rule) and q_events_markov
    (removal-effect attribution). The conversion-touch pair space is a
    per-user time-range self-join — fanout bounded by one user's own
    7-day activity, the same bounded-blowup argument as the dedup
    family; at 100 TB the equi-key (user_id) hash join co-partitions
    both sides and skewed mega-users are handled by the salted-join
    helper (functions/skew.py). Credit 1/k is a rational with k = the
    conversion's touch count; the float sum is rounded at 4 dp after a
    sub-1e-12 noise floor.
    """
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    conv = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"), "user_id", us.alias("cts")
    )
    touch = e.filter(
        F.col("event_type").isin("click", "view", "signup")
    ).select("user_id", F.col("event_type").alias("channel"), us.alias("tts"))
    pairs = (
        conv.join(touch, "user_id")
        .filter(
            (F.col("tts") <= F.col("cts"))
            & (F.col("tts") > F.col("cts") - F.lit(_LOOKBACK_US))
        )
        .select("conv_id", "channel")
        .transform(materialize)  # consumed by the per-conversion count AND
        # the credit join — unchecked, the range self-join runs twice
    )
    k = pairs.groupBy("conv_id").agg(F.count(F.lit(1)).alias("k"))
    return (
        pairs.join(k, "conv_id")
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.count_distinct("conv_id").alias("n_conversions"),
            F.round(F.sum(F.lit(1.0) / F.col("k")), 4).alias("credit"),
        )
    )


_MIN_SUPPORT = 2


@register(
    "q_itemsets_triples",
    oracle=f"""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
triples AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         c.l_partkey AS part_c, CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM items a
  JOIN items b ON a.l_orderkey = b.l_orderkey
              AND a.l_partkey < b.l_partkey
  JOIN items c ON b.l_orderkey = c.l_orderkey
              AND b.l_partkey < c.l_partkey
  GROUP BY 1, 2, 3)
SELECT part_a, part_b, part_c, n_orders
FROM triples WHERE n_orders >= {_MIN_SUPPORT}
""",
)
def q_itemsets_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent 3-itemsets (support >= {_MIN_SUPPORT} co-orders) — the
    k=3 a-priori step above q_basket_lift's pairs.

    The Spark plan prunes with the a-priori property BEFORE the
    quadratic expansion: items appearing in < minsup orders cannot be in
    any frequent triple, so they are semi-join-filtered out of the
    per-order item lists first (the frequent-item set is tiny and
    broadcast). Then the pair/triple space is the inverted-index
    self-join on l_orderkey — Σ_orders k³ with k = pruned items/order,
    never catalog³. The oracle omits the prune (same result by the
    a-priori property); the differential check therefore *proves* the
    prune is lossless.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # materialize once: items feeds the frequency prune AND the pruned
    # stream; pruned feeds all THREE self-join sides — unchecked, each
    # consumer replans the lineitem scan + distinct exchange
    items = li.select("l_orderkey", "l_partkey").distinct().transform(materialize)
    freq = (
        items.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= _MIN_SUPPORT)
        .select("l_partkey")
    )
    pruned = (
        items.join(F.broadcast(freq), "l_partkey")
        .select("l_orderkey", "l_partkey")
        .transform(materialize)
    )
    # shared exchange for the 3-way self-join: repartition on the join
    # key BEFORE aliasing so ReuseExchange shuffles pruned once, not 3x
    pb = pruned.repartition("l_orderkey")
    a = pb.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = pb.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    c = pb.select("l_orderkey", F.col("l_partkey").alias("part_c"))
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .join(c, "l_orderkey")
        .filter(F.col("part_b") < F.col("part_c"))
        .groupBy("part_a", "part_b", "part_c")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= _MIN_SUPPORT)
    )


@register(
    "q_join_asof_interpolate",
    oracle=f"""
{E_CTE},
probe AS (
  SELECT event_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS pts
  FROM e WHERE event_type = 'purchase'),
src AS (
  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS sts, value
  FROM e WHERE event_type = 'view'),
u AS (
  SELECT user_id, pts AS us, 1 AS is_probe, event_id,
         CAST(NULL AS BIGINT) AS sts, CAST(NULL AS DOUBLE) AS value
  FROM probe
  UNION ALL
  SELECT user_id, sts AS us, 0 AS is_probe, CAST(NULL AS BIGINT), sts, value
  FROM src),
m AS (
  SELECT user_id, us, is_probe, event_id,
         LAST_VALUE(sts IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY us, is_probe
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_ts,
         LAST_VALUE(value IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY us, is_probe
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_val,
         FIRST_VALUE(sts IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY us, is_probe
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_ts,
         FIRST_VALUE(value IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY us, is_probe
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_val
  FROM u)
SELECT event_id, user_id, us AS probe_us, prev_ts, next_ts,
       ROUND(CASE
         WHEN prev_ts IS NULL OR next_ts IS NULL THEN NULL
         WHEN next_ts = prev_ts THEN prev_val
         ELSE prev_val + (next_val - prev_val)
                         * (us - prev_ts) / (next_ts - prev_ts)
       END, 4) AS value_interp
FROM m WHERE is_probe = 1
""",
)
def q_join_asof_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated as-of join: each purchase gets the user's 'view'
    value series LINEARLY INTERPOLATED at the purchase timestamp
    (backward+forward as-of neighbors, lerp between them) — the
    time-series alignment primitive (cf. q_join_asof's last-value-only
    semantics and q_gap_fill's grid fill).

    Plan: union probe and source rows, one per-user window pass carries
    the previous source row forward (LAST IGNORE NULLS) and the next
    source row backward (FIRST IGNORE NULLS over the following frame) —
    NO range self-join, NO per-probe scan of the series. Cost is one
    shuffle on user_id + two sorted window passes over each user's own
    events; source rows sort before probes at equal timestamps
    (is_probe tiebreak) so a same-instant observation counts as `prev`
    in both engines. The lerp is the identical IEEE expression on exact
    µs ints in both engines, rounded at 4 dp.
    """
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    probe = e.filter(F.col("event_type") == "purchase").select(
        "user_id", us.alias("us"), F.lit(1).alias("is_probe"),
        "event_id", F.lit(None).cast("long").alias("sts"),
        F.lit(None).cast("double").alias("value"),
    )
    src = e.filter(F.col("event_type") == "view").select(
        "user_id", us.alias("us"), F.lit(0).alias("is_probe"),
        F.lit(None).cast("long").alias("event_id"), us.alias("sts"),
        "value",
    )
    u = probe.unionByName(src)
    order = [F.col("us"), F.col("is_probe")]
    back = (
        Window.partitionBy("user_id").orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("user_id").orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    m = u.select(
        "user_id", "us", "is_probe", "event_id",
        F.last("sts", ignorenulls=True).over(back).alias("prev_ts"),
        F.last("value", ignorenulls=True).over(back).alias("prev_val"),
        F.first("sts", ignorenulls=True).over(fwd).alias("next_ts"),
        F.first("value", ignorenulls=True).over(fwd).alias("next_val"),
    )
    lerp = F.when(
        F.col("prev_ts").isNull() | F.col("next_ts").isNull(),
        F.lit(None).cast("double"),
    ).when(
        F.col("next_ts") == F.col("prev_ts"), F.col("prev_val")
    ).otherwise(
        F.col("prev_val")
        + (F.col("next_val") - F.col("prev_val"))
        * (F.col("us") - F.col("prev_ts"))
        / (F.col("next_ts") - F.col("prev_ts"))
    )
    return m.filter(F.col("is_probe") == 1).select(
        "event_id", "user_id", F.col("us").alias("probe_us"),
        "prev_ts", "next_ts", F.round(lerp, 4).alias("value_interp"),
    )
