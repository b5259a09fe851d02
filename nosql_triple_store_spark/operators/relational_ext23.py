"""Twenty-third extension batch: full-outer reconciliation, graph degree
assortativity, and a smoothed bigram-LM cross-entropy scorer.

Lineage: FULL OUTER completes the join-type surface (inner/left/semi/
anti/theta/asof/interval/nullsafe elsewhere); assortativity extends the
graph-statistics family with a closed-form moment computed from exact
integer degrees; the LM scorer upgrades q_text_bigram_novelty's rare-
gram proxy to an actual Laplace-smoothed language model trained and
evaluated on disjoint corpus halves — the real perplexity-filtering
shape."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.textfns import TOKS_SQL, tokens_col
from ..registry import register
from .triple import E_CTE

_FULLOUTER_ORACLE = f"""
{E_CTE},
buyers AS (
  SELECT DISTINCT o_custkey AS k FROM orders
  WHERE o_orderdate >= TIMESTAMP '2001-01-01'),
actives AS (
  SELECT user_id AS k, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM e GROUP BY user_id),
j AS (
  SELECT COALESCE(b.k, a.k) AS k,
         b.k IS NOT NULL AS is_buyer,
         a.k IS NOT NULL AS is_active
  FROM buyers b FULL OUTER JOIN actives a ON b.k = a.k)
SELECT CASE WHEN is_buyer AND is_active THEN 'both'
            WHEN is_buyer THEN 'buyer_only'
            ELSE 'active_only' END AS category,
       CAST(COUNT(*) AS BIGINT) AS n
FROM j GROUP BY 1
"""


@register("q_join_full_outer", oracle=_FULLOUTER_ORACLE)
def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER reconciliation of two derived entity sets — recent
    buyers (2001+ orders — probed so all THREE categories are non-empty
    at every tier; 1998+ made active_only vacuous at sf0.001) vs
    event-active users — into the three-way both / left-only /
    right-only census. This is the data-reconciliation shape (two
    systems' extracts, which records disagree?) that inner joins
    silently hide. One shuffle on the key; null-flag classification
    happens post-join in codegen."""
    orders = load_table(spark, sf_dir, "orders")
    ev = load_table(spark, sf_dir, "events")
    buyers = (
        orders.filter(
            F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp_ntz")
        )
        .select(F.col("o_custkey").alias("bk"))
        .distinct()
    )
    actives = ev.groupBy(F.col("user_id").alias("ak")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    j = buyers.join(actives, F.col("bk") == F.col("ak"), "full_outer")
    return j.select(
        F.when(
            F.col("bk").isNotNull() & F.col("ak").isNotNull(), "both"
        )
        .when(F.col("bk").isNotNull(), "buyer_only")
        .otherwise("active_only")
        .alias("category")
    ).groupBy("category").agg(F.count(F.lit(1)).alias("n"))


_ASSORT_ORACLE = """
WITH pairs AS (
  SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
und AS (
  SELECT pa AS src, pb AS dst FROM pairs
  UNION ALL SELECT pb, pa FROM pairs),
deg AS (
  SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS d
  FROM und GROUP BY src),
xy AS (
  SELECT du.d AS x, dv.d AS y
  FROM und JOIN deg du ON und.src = du.node
           JOIN deg dv ON und.dst = dv.node),
s AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(x * y) AS DOUBLE) AS sxy,
         CAST(SUM(x * x) AS DOUBLE) AS sxx,
         CAST(SUM(y * y) AS DOUBLE) AS syy
  FROM xy)
SELECT CAST(n AS BIGINT) AS n_edge_ends,
       (n*sxy - sx*sy) / sqrt((n*sxx - sx*sx) * (n*syy - sy*sy))
         AS assortativity
FROM s
"""


@register("q_graph_assortativity", oracle=_ASSORT_ORACLE)
def q_graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the co-purchase graph: the Pearson
    correlation of endpoint degrees over all directed edge ends
    (Newman's r — do hubs link to hubs?). Degrees are exact integer
    counts, so the correlation reduces to six exact sums and one closed
    form — bit-identical cross-engine (the q_agg_corr_regr discipline
    applied to a graph moment). Costs one edge-derivation (shared shape
    with q_graph_triangles), one degree aggregate, and one broadcast-
    able degree join per edge end."""
    from .graph_ext3 import _copurchase_edges

    # Shared materialized edge relation (see graph_ext3._copurchase_edges):
    # the und stream below fans out twice (degree agg + edge-end join) and
    # now re-reads a 2-column parquet instead of re-deriving the self-join.
    pairs = _copurchase_edges(spark, sf_dir)
    und = pairs.select(
        F.col("pa").alias("src"), F.col("pb").alias("dst")
    ).unionByName(
        pairs.select(F.col("pb").alias("src"), F.col("pa").alias("dst"))
    )
    deg = und.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("d")
    )
    du = deg.select(F.col("node").alias("su"), F.col("d").alias("x"))
    dv = deg.select(F.col("node").alias("sv"), F.col("d").alias("y"))
    xy = und.join(du, F.col("src") == F.col("su")).join(
        dv, F.col("dst") == F.col("sv")
    )
    s = xy.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    return s.select(
        n.cast("long").alias("n_edge_ends"),
        (
            (n * sxy - sx * sy)
            / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
        ).alias("assortativity"),
    )


_LM_ORACLE = f"""
WITH toks AS (SELECT doc_id, {TOKS_SQL} AS t FROM documents),
bi AS (
  SELECT doc_id, t[u.i] AS w1, t[u.i + 1] AS w2
  FROM toks, LATERAL UNNEST(generate_series(1, len(t) - 1)) AS u(i)),
train_uni AS (
  SELECT w1, CAST(COUNT(*) AS BIGINT) AS cu
  FROM bi WHERE doc_id % 2 = 0 GROUP BY w1),
train_bi AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cb
  FROM bi WHERE doc_id % 2 = 0 GROUP BY w1, w2),
vocab AS (
  SELECT CAST(COUNT(DISTINCT t.tok) AS BIGINT) AS v
  FROM (SELECT unnest(tk.t) AS tok FROM toks tk WHERE tk.doc_id % 2 = 0) t),
eval_bi AS (
  SELECT b.w1, b.w2,
         COALESCE(tb.cb, 0) AS cb, COALESCE(tu.cu, 0) AS cu
  FROM bi b
  LEFT JOIN train_bi tb ON b.w1 = tb.w1 AND b.w2 = tb.w2
  LEFT JOIN train_uni tu ON b.w1 = tu.w1
  WHERE b.doc_id % 2 = 1)
SELECT CAST(COUNT(*) AS BIGINT) AS n_eval_bigrams,
       CAST(MAX(vocab.v) AS BIGINT) AS vocab_size,
       ROUND(-SUM(ln((CAST(cb AS DOUBLE) + 1)
                     / (CAST(cu AS DOUBLE) + CAST(vocab.v AS DOUBLE))))
             / COUNT(*), 6) AS cross_entropy
FROM eval_bi, vocab GROUP BY ()
"""


@register("q_text_lm_crossentropy", oracle=_LM_ORACLE)
def q_text_lm_crossentropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model cross-entropy: train Laplace-smoothed
    bigram probabilities p(w2|w1) = (c(w1,w2)+1)/(c(w1)+V) on even
    doc_ids, score odd doc_ids with H = −mean ln p — actual
    perplexity-style quality filtering (q_text_bigram_novelty is the
    exact-arithmetic proxy; this is the model). Counts and vocab are
    exact ints; each ln argument is one identical division — but ln
    itself is the known cross-engine ulp hazard (q_events_entropy), and
    the ln-sum accumulates in engine order, so H rounds at 6dp. Train/
    eval split by doc parity keeps the evaluation honest. Shuffles:
    bigram/unigram count aggregates and two broadcast-able model joins
    against the eval stream — the model tables are tiny relative to the
    corpus, exactly how an n-gram scorer deploys at 100 TB."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens_col().alias("t"))
    bi = toks.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("t") < 2,
                F.array().cast("array<struct<w1:string,w2:string>>"),
            ).otherwise(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 1),
                    lambda i: F.struct(
                        F.element_at("t", i).alias("w1"),
                        F.element_at("t", i + 1).alias("w2"),
                    ),
                )
            )
        ).alias("b"),
    ).select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    train = bi.filter(F.col("doc_id") % 2 == 0)
    evalb = bi.filter(F.col("doc_id") % 2 == 1)
    train_bi = train.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    train_uni = train.groupBy("w1").agg(F.count(F.lit(1)).alias("cu"))
    vocab = (
        toks.filter(F.col("doc_id") % 2 == 0)
        .select(F.explode("t").alias("tok"))
        .agg(F.countDistinct("tok").alias("v"))
    )
    scored = (
        evalb.join(F.broadcast(train_bi), ["w1", "w2"], "left")
        .join(F.broadcast(train_uni), ["w1"], "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            F.coalesce("cb", F.lit(0)).alias("cb"),
            F.coalesce("cu", F.lit(0)).alias("cu"),
            "v",
        )
    )
    return scored.agg(
        F.count(F.lit(1)).alias("n_eval_bigrams"),
        F.max("v").alias("vocab_size"),
        F.round(
            -F.sum(
                F.log(
                    (F.col("cb").cast("double") + 1)
                    / (F.col("cu").cast("double") + F.col("v").cast("double"))
                )
            )
            / F.count(F.lit(1)),
            6,
        ).alias("cross_entropy"),
    )
