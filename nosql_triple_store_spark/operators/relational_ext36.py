"""Thirty-sixth extension batch: cross-engine KMV/theta set sketches,
M4 time-series downsampling, a k-anonymity suppression census, and a
dyad/reciprocity census on the session-transition digraph.

Lineage: rounds out three monitoring surfaces the reference's report
gestures at for an operated triple store (report.pdf §2: replica-set
cardinality reconciliation, dashboarding over the changelog) plus the
privacy gate every training-data pipeline runs before export. All
four queries are oracle-exact: the sketch uses the explicit affine
32-bit hash (shared convention with relational_ext35) so DuckDB
computes bit-identical estimates, and every ratio is either an exact
integer (ppm) or a double produced by the identical IEEE expression
in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .triple import E_CTE

# affine 32-bit mix shared with relational_ext35: odd multiplier =>
# bijection mod 2^32, pre-mod by 2^31 keeps the product under 2^63.
_HASH_SQL = (
    "CAST(((({key}) % 2147483648) * 2654435761 + 12345) % 4294967296"
    " AS BIGINT)"
)

_KMV_K = 32
_TWO32 = 4294967296
# (K-1) * 2^32 as an exactly-representable double literal, so the
# estimate expression `C / kth` is the same single IEEE division in
# both engines.
_KMV_NUM = float((_KMV_K - 1) * _TWO32)


@register(
    "q_agg_kmv_theta",
    oracle=f"""
WITH ua AS (
  SELECT DISTINCT {_HASH_SQL.format(key='user_id')} AS h
  FROM events WHERE event_type = 'click'),
ub AS (
  SELECT DISTINCT {_HASH_SQL.format(key='user_id')} AS h
  FROM events WHERE event_type = 'purchase'),
ska AS (SELECT h FROM ua ORDER BY h LIMIT {_KMV_K}),
skb AS (SELECT h FROM ub ORDER BY h LIMIT {_KMV_K}),
sa AS (SELECT CAST(COUNT(*) AS BIGINT) AS cnt_a,
              MAX(h) AS kth_a FROM ska),
sb AS (SELECT CAST(COUNT(*) AS BIGINT) AS cnt_b,
              MAX(h) AS kth_b FROM skb),
st AS (
  SELECT *,
         LEAST(CASE WHEN cnt_a >= {_KMV_K} THEN kth_a
                    ELSE {_TWO32} END,
               CASE WHEN cnt_b >= {_KMV_K} THEN kth_b
                    ELSE {_TWO32} END) AS theta
  FROM sa, sb),
ix AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS sample_inter
  FROM ska JOIN skb USING (h), st
  WHERE ska.h < st.theta),
est AS (
  SELECT st.*, ix.sample_inter,
         CASE WHEN cnt_a < {_KMV_K} THEN CAST(cnt_a AS DOUBLE)
              ELSE {_KMV_NUM!r} / kth_a END AS est_a,
         CASE WHEN cnt_b < {_KMV_K} THEN CAST(cnt_b AS DOUBLE)
              ELSE {_KMV_NUM!r} / kth_b END AS est_b,
         (sample_inter * 4294967296.0) / theta AS est_inter
  FROM st, ix)
SELECT CAST({_KMV_K} AS BIGINT) AS k, cnt_a, cnt_b, theta,
       sample_inter, est_a, est_b, est_inter,
       est_a + est_b - est_inter AS est_union
FROM est
""",
)
def q_agg_kmv_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV / theta-sketch set algebra: bottom-k distinct-hash sketches
    of two user populations (clickers, purchasers) combined into
    distinct-count, intersection, and union ESTIMATES — the sketch
    family behind cross-replica cardinality reconciliation (the
    reference reconciles replica sets by shipping full member lists;
    a KMV sketch ships k tags and answers |A|, |A∩B|, |A∪B| within
    O(1/sqrt(k))). Unlike HLL (q_agg_approx_distinct, engine-specific
    merge => rows-only) the KMV estimate is a pure function of the
    explicit affine hash, so DuckDB reproduces every output bit —
    including the IEEE division, written as the identical expression
    in both engines.

    Scale: each sketch is TakeOrdered(k) over distinct hashes — a
    per-partition bottom-k partial then one k-row merge, never a
    global sort; the combination stage touches only <= 2k rows. The
    sketch is mergeable (bottom-k of unions = bottom-k of merged
    bottom-k's), so per-shard sketches compose across a 1000-executor
    scan without reshuffling the raw data.
    """
    ev = load_table(spark, sf_dir, "events")
    h = F.expr(_HASH_SQL.format(key="user_id")).alias("h")

    def sketch(event_type: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == event_type)
            .select(h)
            .distinct()
            .orderBy("h")
            .limit(_KMV_K)
        )

    ska = sketch("click")
    skb = sketch("purchase")
    sa = ska.agg(
        F.count(F.lit(1)).alias("cnt_a"), F.max("h").alias("kth_a")
    )
    sb = skb.agg(
        F.count(F.lit(1)).alias("cnt_b"), F.max("h").alias("kth_b")
    )
    st = sa.crossJoin(F.broadcast(sb)).withColumn(
        "theta",
        F.least(
            F.when(F.col("cnt_a") >= _KMV_K, F.col("kth_a")).otherwise(
                F.lit(_TWO32)
            ),
            F.when(F.col("cnt_b") >= _KMV_K, F.col("kth_b")).otherwise(
                F.lit(_TWO32)
            ),
        ),
    )
    ix = (
        ska.join(skb, "h")
        .crossJoin(F.broadcast(st.select("theta")))
        .filter(F.col("h") < F.col("theta"))
        .agg(F.count(F.lit(1)).alias("sample_inter"))
    )
    est = (
        st.crossJoin(F.broadcast(ix))
        .withColumn(
            "est_a",
            F.when(
                F.col("cnt_a") < _KMV_K, F.col("cnt_a").cast("double")
            ).otherwise(F.lit(_KMV_NUM) / F.col("kth_a")),
        )
        .withColumn(
            "est_b",
            F.when(
                F.col("cnt_b") < _KMV_K, F.col("cnt_b").cast("double")
            ).otherwise(F.lit(_KMV_NUM) / F.col("kth_b")),
        )
        .withColumn(
            "est_inter",
            (F.col("sample_inter") * F.lit(4294967296.0))
            / F.col("theta"),
        )
    )
    return est.select(
        F.lit(_KMV_K).cast("long").alias("k"),
        "cnt_a",
        "cnt_b",
        "theta",
        "sample_inter",
        "est_a",
        "est_b",
        "est_inter",
        (F.col("est_a") + F.col("est_b") - F.col("est_inter")).alias(
            "est_union"
        ),
    )


_M4_BUCKET_US = 86_400_000_000  # one day


@register(
    "q_events_m4_downsample",
    oracle=f"""
{E_CTE},
pts AS (
  SELECT CAST(epoch_us(ts) AS BIGINT) AS t, value AS v FROM e)
SELECT t // {_M4_BUCKET_US} AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(v) AS v_min, MAX(v) AS v_max,
       arg_min(v, t) AS v_first, arg_max(v, t) AS v_last,
       MIN(t) AS t_first_us, MAX(t) AS t_last_us
FROM pts GROUP BY 1
""",
)
def q_events_m4_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 time-series downsampling (Jugel et al., VLDB 2014): per
    fixed time bucket keep exactly the four value extremes a
    pixel-perfect line rendering needs — min, max, first, last — so a
    dashboard over a 100 TB changelog pulls |buckets|*4 points instead
    of the raw series, with zero visual error at the chosen width.
    first/last are selected by event time (timestamps are unique in
    this dataset; on ties min_by/arg_min both pick an arbitrary
    extremum, so production data should extend the ordering key).

    Scale: a single hash aggregation — min/max/min_by/max_by are all
    partial-aggregable, so each executor reduces its partitions to 4
    values per bucket before the one tiny shuffle on bucket id. No
    sort, no window.
    """
    ev = load_table(spark, sf_dir, "events")
    t = F.unix_micros(F.col("ts").cast("timestamp"))
    pts = ev.select(t.alias("t"), F.col("value").alias("v"))
    return pts.groupBy(
        F.expr(f"t div {_M4_BUCKET_US}").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("v").alias("v_min"),
        F.max("v").alias("v_max"),
        F.min_by("v", "t").alias("v_first"),
        F.max_by("v", "t").alias("v_last"),
        F.min("t").alias("t_first_us"),
        F.max("t").alias("t_last_us"),
    )


_KANON_K = 3


@register(
    "q_privacy_kanon",
    oracle=f"""
WITH q AS (
  SELECT c_mktsegment AS segment, c_nationkey AS nat,
         CAST(FLOOR(c_acctbal / 2000) AS BIGINT) AS bal_band,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM customer GROUP BY 1, 2, 3)
SELECT segment,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(CASE WHEN n < {_KANON_K} THEN 1 ELSE 0 END) AS BIGINT)
         AS small_groups,
       CAST(SUM(CASE WHEN n < {_KANON_K} THEN n ELSE 0 END) AS BIGINT)
         AS suppressed_rows,
       CAST(SUM(CASE WHEN n >= {_KANON_K} THEN n ELSE 0 END) AS BIGINT)
         AS safe_rows,
       CAST(MIN(n) AS BIGINT) AS min_group_size
FROM q GROUP BY segment
""",
)
def q_privacy_kanon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity suppression census: group customers by the
    quasi-identifier tuple (nation, market segment, account-balance
    band) and report, per segment, how many equivalence classes fall
    below k={_KANON_K} and how many rows a release would therefore
    have to suppress — the privacy gate a training-data export runs
    before shipping user-derived records. Exact integer arithmetic
    end to end; the balance band is FLOOR(x/2000), identical IEEE
    semantics in both engines (negative balances round toward -inf).

    Scale: two stacked hash aggregations, both partial-aggregable;
    the second input is bounded by the quasi-identifier domain, not
    the row count. No shuffle of raw rows beyond the first groupBy.
    """
    cust = load_table(spark, sf_dir, "customer")
    q = cust.groupBy(
        F.col("c_mktsegment").alias("segment"),
        F.col("c_nationkey").alias("nat"),
        F.floor(F.col("c_acctbal") / 2000).alias("bal_band"),
    ).agg(F.count(F.lit(1)).alias("n"))
    return q.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(F.when(F.col("n") < _KANON_K, 1).otherwise(0)).alias(
            "small_groups"
        ),
        F.sum(
            F.when(F.col("n") < _KANON_K, F.col("n")).otherwise(0)
        ).alias("suppressed_rows"),
        F.sum(
            F.when(F.col("n") >= _KANON_K, F.col("n")).otherwise(0)
        ).alias("safe_rows"),
        F.min("n").alias("min_group_size"),
    )


@register(
    "q_graph_reciprocity",
    oracle=f"""
{E_CTE},
nodes AS (
  SELECT user_id AS u, ts,
         event_type || '@' || CAST(EXTRACT(hour FROM ts) AS VARCHAR)
           AS node
  FROM e),
tr AS (
  SELECT u, node AS a,
         LEAD(node) OVER (PARTITION BY u ORDER BY ts) AS b
  FROM nodes),
ed AS (
  SELECT a, b, CAST(COUNT(*) AS BIGINT) AS w
  FROM tr WHERE b IS NOT NULL GROUP BY 1, 2),
nl AS (SELECT a, b, w FROM ed WHERE a <> b),
dy AS (
  SELECT LEAST(a, b) AS lo, GREATEST(a, b) AS hi,
         CAST(COUNT(*) AS BIGINT) AS dirs,
         CAST(SUM(w) AS BIGINT) AS w_sum
  FROM nl GROUP BY 1, 2)
SELECT
  CAST((SELECT COUNT(*) FROM ed) AS BIGINT) AS n_edges,
  CAST((SELECT COALESCE(SUM(w), 0) FROM ed WHERE a = b) AS BIGINT)
    AS self_loop_w,
  CAST(SUM(CASE WHEN dirs = 2 THEN 1 ELSE 0 END) AS BIGINT)
    AS mutual_dyads,
  CAST(SUM(CASE WHEN dirs = 1 THEN 1 ELSE 0 END) AS BIGINT)
    AS asym_dyads,
  CAST((2 * SUM(CASE WHEN dirs = 2 THEN 1 ELSE 0 END) * 1000000)
       // SUM(dirs) AS BIGINT) AS recip_ppm
FROM dy
""",
)
def q_graph_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dyad census / edge reciprocity on the session-transition
    digraph: nodes are (event_type, hour-of-day) states, edges are
    consecutive-event transitions per user (the same derived graph
    family as q_events_markov). Reports mutual vs asymmetric dyads
    and Garlaschelli-Loffredo-style reciprocity = fraction of
    non-loop directed edges whose reverse also exists, as an exact
    ppm integer.

    Scale: the LEAD window is partitioned by user (bounded per-user
    frames, never global); edges reduce by hash aggregation; the
    dyad fold aggregates the EDGE table (already |V|^2-bounded), not
    raw events. hour() here is hour-of-timestamp on a TZ-less value —
    both engines extract from the same wall-clock field.
    """
    ev = load_table(spark, sf_dir, "events")
    node = F.concat_ws(
        "@", F.col("event_type"), F.hour("ts").cast("string")
    )
    nodes = ev.select(
        F.col("user_id").alias("u"), "ts", node.alias("node")
    )
    w = Window.partitionBy("u").orderBy("ts")
    tr = nodes.select(
        F.col("node").alias("a"), F.lead("node").over(w).alias("b")
    ).filter(F.col("b").isNotNull())
    ed = tr.groupBy("a", "b").agg(F.count(F.lit(1)).alias("w"))
    n_edges = ed.agg(F.count(F.lit(1)).alias("n_edges"))
    loops = ed.filter(F.col("a") == F.col("b")).agg(
        F.coalesce(F.sum("w"), F.lit(0)).alias("self_loop_w")
    )
    nl = ed.filter(F.col("a") != F.col("b"))
    dy = nl.groupBy(
        F.least("a", "b").alias("lo"), F.greatest("a", "b").alias("hi")
    ).agg(F.count(F.lit(1)).alias("dirs"))
    census = dy.agg(
        F.sum(F.when(F.col("dirs") == 2, 1).otherwise(0)).alias(
            "mutual_dyads"
        ),
        F.sum(F.when(F.col("dirs") == 1, 1).otherwise(0)).alias(
            "asym_dyads"
        ),
        F.sum("dirs").alias("total_dirs"),
    )
    return (
        n_edges.crossJoin(F.broadcast(loops))
        .crossJoin(F.broadcast(census))
        .select(
            "n_edges",
            "self_loop_w",
            "mutual_dyads",
            "asym_dyads",
            F.expr(
                "CAST(2 * mutual_dyads * 1000000 div total_dirs"
                " AS BIGINT)"
            ).alias("recip_ppm"),
        )
    )
