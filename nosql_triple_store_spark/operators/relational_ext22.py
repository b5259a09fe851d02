"""Twenty-second extension batch: cross-modal pair join, event-sourced
running balance, and sweep-line peak concurrency.

Lineage: the pair join is the text↔embedding alignment step multimodal
curation pipelines run before contrastive training (quality-gate the
text, fetch its vector, audit the pairing); the other two are the
ledger/occupancy shapes (SURVEY §2.B: the reference has no windows at
all)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.prefix import bucketed_running_sum
from ..registry import register
from .triple import E_CTE

_PAIR_ORACLE = """
WITH q AS (
  SELECT doc_id, lang, n_chars FROM documents WHERE n_chars >= 120),
e AS (
  SELECT vec_id, label,
         list_sum([CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                   for x in embedding]) AS norm2
  FROM embeddings)
SELECT q.lang,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(COUNT(DISTINCT e.label) AS BIGINT) AS n_labels,
       MIN(e.norm2) AS norm2_min,
       MAX(e.norm2) AS norm2_max
FROM q JOIN e ON q.doc_id = e.vec_id
GROUP BY q.lang
"""


@register("q_multimodal_pair_join", oracle=_PAIR_ORACLE)
def q_multimodal_pair_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal pair assembly: quality-gated captions (n_chars ≥ 120)
    joined to their embeddings (doc_id = vec_id), per-language pair
    counts plus the min/max embedding norm² — the gate-then-align-then-
    audit pass a contrastive-training dataset build runs. Norm² is the
    bit-identical sequential fold (q_vector_stats), and MIN/MAX are
    order-free, so the float columns need no rounding. One broadcast-
    able join keyed by id; at 100 TB the embeddings side is the big one
    and the filtered caption side is what broadcasts."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("n_chars") >= 120
    )
    emb = load_table(spark, sf_dir, "embeddings")
    norm2 = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double")),
        F.lit(0.0),
        lambda a, x: a + x * x,
    )
    e = emb.select("vec_id", "label", norm2.alias("norm2"))
    return (
        docs.join(e, docs["doc_id"] == e["vec_id"])
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("label").alias("n_labels"),
            F.min("norm2").alias("norm2_min"),
            F.max("norm2").alias("norm2_max"),
        )
    )


_BALANCE_ORACLE = """
WITH m AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         CAST(COUNT(*) AS BIGINT) AS opened,
         CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT)
           AS closed
  FROM orders GROUP BY 1)
SELECT month, opened, closed,
       CAST(SUM(opened - closed) OVER (ORDER BY month
                                       ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS open_balance
FROM m
"""


@register("q_orders_open_balance", oracle=_BALANCE_ORACLE)
def q_orders_open_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-sourced running balance: monthly order openings vs
    completions ('F' status), with the cumulative open-order backlog —
    the ledger shape (account balances, inventory levels, queue depth)
    where the CURRENT state is a running sum over the full changelog.
    Exact ints with an explicit ROWS frame; the window input is ~80
    month rows, not orders. This is also the reference's changelog
    (R4) read as a time series instead of a dict snapshot."""
    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month")
    ).agg(
        F.count(F.lit(1)).alias("opened"),
        F.count_if(F.col("o_orderstatus") == "F").alias("closed"),
    )
    w = Window.orderBy("month").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return m.select(
        "month",
        "opened",
        "closed",
        F.sum(F.col("opened") - F.col("closed")).over(w).alias("open_balance"),
    )


_SESSION_US = 900 * 1_000_000

_PEAK_ORACLE = f"""
{E_CTE},
deltas AS (
  SELECT CAST(epoch_us(ts) AS BIGINT) AS t, 1 AS d, event_id FROM e
  UNION ALL
  SELECT CAST(epoch_us(ts) AS BIGINT) + {_SESSION_US}, -1, event_id FROM e),
swept AS (
  SELECT t, d,
         CAST(SUM(d) OVER (ORDER BY t, d, event_id
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS conc
  FROM deltas)
SELECT CAST(MAX(conc) AS BIGINT) AS peak_concurrency,
       CAST(MIN(CASE WHEN conc = (SELECT MAX(conc) FROM swept)
                     THEN t END) AS BIGINT) AS peak_at_us
FROM swept
"""


@register("q_events_peak_concurrency", oracle=_PEAK_ORACLE)
def q_events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line peak concurrency: each event opens a 15-minute
    activity interval; +1/−1 boundary deltas sorted by time give a
    running occupancy count whose max is the peak simultaneous load
    (capacity planning's first question). Ordering ties break by
    (delta, event_id) with closes (−1) BEFORE opens at the same
    instant — pinned identically in both engines. All integer-µs
    arithmetic. The sweep runs over 2·|events| boundary rows, but NOT
    through one task: functions/prefix.bucketed_running_sum buckets the
    timeline into 32 contiguous ranges, runs the running sum per bucket
    in parallel, and composes the per-bucket totals with a broadcast
    32-row prefix — deltas are exact ints, so the re-association is
    bit-identical to the oracle's sequential window."""
    ev = load_table(spark, sf_dir, "events")
    t = F.unix_micros(F.col("ts").cast("timestamp"))
    opens = ev.select(
        t.alias("t"), F.lit(1).alias("d"), F.col("event_id")
    )
    closes = ev.select(
        (t + _SESSION_US).alias("t"), F.lit(-1).alias("d"), F.col("event_id")
    )
    deltas = opens.unionByName(closes)
    swept = bucketed_running_sum(
        deltas, "d", "t", tiebreaks=("d", "event_id"), out_col="conc"
    ).select("t", "conc")
    peak = swept.agg(F.max("conc").alias("peak"))
    return (
        swept.crossJoin(F.broadcast(peak))
        .filter(F.col("conc") == F.col("peak"))
        .agg(
            F.max("conc").alias("peak_concurrency"),
            F.min("t").alias("peak_at_us"),
        )
    )
