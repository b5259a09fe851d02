"""Fortieth extension batch: value-band self-join, week-over-week
deltas, and tokenizer vocabulary-coverage economics.

Lineage: the band join generalizes the engine's bucketed range-join
recipe (relational_ext32 / q_join_range_bucketed) from time intervals
to VALUE proximity — the |x - y| <= eps self-pairing that powers
price-matching and near-duplicate numeric detection without a nested
loop. WoW deltas are the ops-dashboard staple. Vocabulary coverage is
the tokenizer-design question ("how much of the corpus do the top-k
terms cover?") behind every BPE vocab-size decision
(q_text_bpe_merges' economics, measured).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.textfns import TOKS_SQL, tokens_col
from ..registry import register
from .triple import E_CTE

_BAND = 0.05


@register(
    "q_join_value_band",
    oracle=f"""
{E_CTE},
v AS (
  SELECT event_id, event_type, value,
         CAST(FLOOR(value / {_BAND}) AS BIGINT) AS b
  FROM e),
cand AS (
  SELECT x.event_type, x.value AS v1, y.value AS v2
  FROM v x
  JOIN v y ON y.event_type = x.event_type
          AND y.b BETWEEN x.b - 1 AND x.b + 1
          AND y.event_id > x.event_id
  WHERE ABS(x.value - y.value) <= {_BAND})
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(MIN(ABS(v1 - v2)), 6) + 0 AS min_gap,
       ROUND(AVG(ABS(v1 - v2)), 6) + 0 AS avg_gap
FROM cand GROUP BY event_type
""",
)
def q_join_value_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band self-join: same-type event pairs whose values lie within
    {_BAND} of each other, found by bucketing values at the band width
    and joining each row against its own and the two adjacent buckets
    — candidates shrink from O(n²) per type to O(n·density), then the
    exact |Δ| <= {_BAND} predicate filters. Pair identity is
    (smaller event_id, larger event_id), counted once.

    Scale: the bucket key turns the inequality into an equi-join the
    planner shuffles on (event_type, bucket), with the 3-bucket probe
    as a tiny explode on one side. Row pairs are never enumerated:
    rows pre-aggregate to (type, value) multiplicity groups — the
    value DOMAIN is fixed, so group count is n-independent — and the
    bucket join runs over groups, weighting each group pair by
    c_x * c_y (plus the C(c,2) zero-gap pairs inside each group). The
    fixed-domain row-pair version measured quadratic at the r7 sf1
    sweep (144 s at 1M events: duplicated values pile into hot cells);
    group pairs keep the per-pair |Δ| <= band predicate on the SAME
    doubles the oracle compares, so exactness is untouched while work
    is O(n) + O(domain).
    """
    ev = load_table(spark, sf_dir, "events")
    g = (
        ev.groupBy("event_type", "value")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("b", F.floor(F.col("value") / _BAND))
    )
    probe = g.select(
        F.col("event_type").alias("pt"),
        F.col("value").alias("pv"),
        F.col("c").alias("pc"),
        F.explode(
            F.array(F.col("b") - 1, F.col("b"), F.col("b") + 1)
        ).alias("pb"),
    )
    cross = (
        g.join(
            probe,
            (F.col("event_type") == F.col("pt"))
            & (F.col("b") == F.col("pb"))
            & (F.col("value") > F.col("pv")),
        )
        .filter(F.abs(F.col("value") - F.col("pv")) <= _BAND)
        .select(
            "event_type",
            F.abs(F.col("value") - F.col("pv")).alias("gap"),
            (F.col("c") * F.col("pc")).alias("m"),
        )
    )
    within = g.filter(F.col("c") >= 2).select(
        "event_type",
        F.lit(0.0).alias("gap"),
        (F.col("c") * (F.col("c") - 1) / 2).cast("long").alias("m"),
    )
    pairs = cross.unionByName(within)
    return pairs.groupBy("event_type").agg(
        F.sum("m").alias("n_pairs"),
        (F.round(F.min("gap"), 6) + F.lit(0.0)).alias("min_gap"),
        (
            F.round(
                F.sum(F.col("gap") * F.col("m").cast("double"))
                / F.sum(F.col("m").cast("double")),
                6,
            )
            + F.lit(0.0)
        ).alias("avg_gap"),
    )


@register(
    "q_events_wow_change",
    oracle=f"""
{E_CTE},
w AS (
  SELECT event_type,
         CAST(ts AS DATE)
           - CAST(isodow(CAST(ts AS DATE)) - 1 AS INTEGER) AS week_start,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM e GROUP BY 1, 2),
lagged AS (
  SELECT event_type, week_start, n,
         LAG(n) OVER (PARTITION BY event_type ORDER BY week_start)
           AS prev_n
  FROM w)
SELECT event_type, week_start, n, prev_n,
       CAST(CASE WHEN prev_n IS NOT NULL
                 THEN ((n - prev_n) * 1000000) // prev_n END AS BIGINT)
         AS wow_ppm
FROM lagged
""",
)
def q_events_wow_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week change per event type: ISO weeks (Monday start,
    derived by date arithmetic in the DATE domain — no session-TZ
    surface), event counts, and the WoW delta as exact floor-division
    ppm. The first week of each type reports NULL.

    Scale: one partial-aggregable census to (type, week), then a lag
    window over the aggregated series (bounded by weeks x types, the
    SCALE.md exemption). Counts are exact ints so the ppm is
    engine-identical including its floor semantics on negatives.
    """
    ev = load_table(spark, sf_dir, "events")
    day = F.col("ts").cast("date")
    week = F.date_sub(day, F.weekday(day))
    w = ev.groupBy(
        "event_type", week.alias("week_start")
    ).agg(F.count(F.lit(1)).alias("n"))
    lw = Window.partitionBy("event_type").orderBy("week_start")
    lagged = w.withColumn("prev_n", F.lag("n").over(lw))
    return lagged.select(
        "event_type",
        "week_start",
        "n",
        "prev_n",
        F.expr(
            "CAST(CASE WHEN prev_n IS NOT NULL THEN"
            " ((n - prev_n) * 1000000) div prev_n END AS BIGINT)"
        ).alias("wow_ppm"),
    )


_COVERAGE_KS = (10, 100, 1000)


@register(
    "q_text_vocab_coverage",
    oracle=f"""
WITH tok AS (
  SELECT unnest({TOKS_SQL}) AS tok FROM documents),
freq AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS f FROM tok GROUP BY tok),
tot AS (
  SELECT SUM(f) AS total_tokens,
         CAST(COUNT(*) AS BIGINT) AS vocab_size FROM freq),
ranked AS (
  SELECT f, row_number() OVER (ORDER BY f DESC, tok) AS rn FROM freq),
ks AS (SELECT unnest(ARRAY{list(_COVERAGE_KS)}) AS k),
cov AS (
  SELECT ks.k, SUM(r.f) AS covered
  FROM ks JOIN ranked r ON r.rn <= ks.k GROUP BY ks.k)
SELECT CAST(ks.k AS BIGINT) AS k,
       tot.vocab_size,
       CAST(tot.total_tokens AS BIGINT) AS total_tokens,
       CAST(COALESCE(cov.covered, 0) AS BIGINT) AS covered_tokens,
       CAST(COALESCE(cov.covered, 0) * 1000000 // tot.total_tokens
            AS BIGINT) AS coverage_ppm
FROM ks LEFT JOIN cov ON cov.k = ks.k, tot
""",
)
def q_text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: what fraction of all corpus token
    occurrences do the top-k most frequent terms cover, for k in
    {_COVERAGE_KS}? The Zipf-economics readout behind tokenizer vocab
    sizing (complement of q_text_zipf's exponent fit and the demand
    side of q_text_bpe_merges). Ranking ties break lexicographically;
    coverage is exact floor-division ppm.

    Scale: token census is one hash aggregation; the top-1000 head is
    TakeOrdered (per-partition partial top-k, one small merge — never
    a global sort of the vocabulary); the in-head ranking window runs
    over <= 1000 rows (bounded by the parameter, not the data).
    """
    docs = load_table(spark, sf_dir, "documents")
    freq = (
        docs.select(F.explode(tokens_col()).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    tot = freq.agg(
        F.sum("f").alias("total_tokens"),
        F.count(F.lit(1)).alias("vocab_size"),
    )
    head = freq.orderBy(F.desc("f"), F.asc("tok")).limit(
        max(_COVERAGE_KS)
    )
    rw = Window.orderBy(F.desc("f"), F.asc("tok"))
    ranked = head.select("f", F.row_number().over(rw).alias("rn"))
    ks = spark.range(len(_COVERAGE_KS)).select(
        F.element_at(
            F.array(*[F.lit(k) for k in _COVERAGE_KS]),
            (F.col("id") + 1).cast("int"),
        ).alias("k")
    )
    cov = (
        ks.crossJoin(ranked)
        .filter(F.col("rn") <= F.col("k"))
        .groupBy("k")
        .agg(F.sum("f").alias("covered_tokens"))
    )
    return (
        ks.join(cov, "k", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("k").cast("long").alias("k"),
            "vocab_size",
            "total_tokens",
            F.coalesce("covered_tokens", F.lit(0)).alias("covered_tokens"),
            F.expr(
                "CAST(COALESCE(covered_tokens, 0) * 1000000"
                " div total_tokens AS BIGINT)"
            ).alias("coverage_ppm"),
        )
    )
