"""Fifty-seventh extension batch (round 5): skew under DATA, not just
unit fixtures — a deliberately Zipf-skewed join registered as a
workload, proving the engine's two skew answers (AQE skew-join
splitting, salting) on a hot key that actually dominates the shuffle.

Lineage: the reference's shard-routing layer assumes uniform subject
hashing (MasterServer range splits); a hot subject silently overloads
one shard with no recourse. Here the hot key is measurable
(q_meta_join_skew), split at runtime by AQE (tests/test_skew_data.py
asserts the skewed-partition reads in the adaptive plan), and fully
mitigable by salting (q_join_salted) — VERDICT r4 #7.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from ..functions.textfns import TOKS_SQL, tokens_col
from ..widths import fanout_width

# ~70% of lineitem rows land on hot key 0 (last order-key digit 0-6);
# the rest spread over the 30 residues {7..97 step 10, 8..98, 9..99}.
_HOT_KEY_SQL = (
    "CASE WHEN l_orderkey % 10 < 7 THEN 0 ELSE l_orderkey % 100 END"
)
_N_DIM = 100


def _skewed_sides(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    # AQE splits a skewed reduce partition at MAP-OUTPUT granularity:
    # the single-file fixture scan is ONE map task, which would leave
    # nothing to split (a 100 TB table has thousands of map tasks and
    # needs no such spread). The fan-out emulates the multi-mapper
    # shuffle the optimization actually operates on.
    li = load_table(spark, sf_dir, "lineitem").repartition(
        fanout_width(spark)
    )
    big = li.select(
        F.when(F.pmod("l_orderkey", F.lit(10)) < 7, F.lit(0))
        .otherwise(F.pmod("l_orderkey", F.lit(100)))
        .cast("long")
        .alias("hk"),
        "l_quantity",
        "l_extendedprice",
    )
    dim = spark.range(_N_DIM).select(
        F.col("id").alias("hk"),
        F.when(F.col("id") == 0, F.lit("hot"))
        .otherwise(F.lit("cold"))
        .alias("tier"),
    )
    return big, dim


@register(
    "q_join_skewed",
    oracle=f"""
WITH big AS (
  SELECT {_HOT_KEY_SQL} AS hk, l_quantity, l_extendedprice FROM lineitem),
dim AS (
  SELECT r AS hk, CASE WHEN r = 0 THEN 'hot' ELSE 'cold' END AS tier
  FROM (SELECT unnest(range({_N_DIM})) AS r))
SELECT b.hk, d.tier,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(b.l_quantity) AS BIGINT) AS qty,
       ROUND(SUM(b.l_extendedprice), 2) AS revenue
FROM big b JOIN dim d ON b.hk = d.hk
GROUP BY b.hk, d.tier
""",
)
def q_join_skewed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Zipf-skewed join workload: ~70% of the fact rows carry ONE
    join key, the canonical shape that melts a uniform hash shuffle
    (one reducer gets 70% of the data). The dim side carries a merge
    hint so the join compiles to a sort-merge join — the strategy AQE's
    skew-join splitting applies to — rather than a broadcast that would
    sidestep the skew (a broadcast is of course the FIRST fix for a
    100-row dim; this query exists to prove the path where the dim is
    too big to broadcast). Under the engine session
    (spark.sql.adaptive.skewJoin.enabled=true) the hot partition is
    split into sub-reads at runtime; tests/test_skew_data.py lowers the
    split threshold to fixture scale and asserts the adaptive plan
    reads the hot partition as multiple skew-split chunks. Results are
    split-invariant (the oracle checks values, not placement).

    Scale: at 100 TB a 70%-hot key is ~70 TB into one task without
    mitigation. AQE splits it into advisory-sized chunks because the
    dim side can replicate per chunk; when even sub-partitions
    overwhelm (or AQE is off), functions/skew.salted_join spreads the
    key over n reducers (q_join_salted is that twin on real data).
    """
    big, dim = _skewed_sides(spark, sf_dir)
    j = big.join(dim.hint("merge"), "hk")
    return j.groupBy("hk", "tier").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("l_quantity").cast("long").alias("qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
    )


@register(
    "q_join_skewed_salted",
    oracle=f"""
WITH big AS (
  SELECT {_HOT_KEY_SQL} AS hk, l_quantity, l_extendedprice FROM lineitem),
dim AS (
  SELECT r AS hk, CASE WHEN r = 0 THEN 'hot' ELSE 'cold' END AS tier
  FROM (SELECT unnest(range({_N_DIM})) AS r))
SELECT b.hk, d.tier,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(b.l_quantity) AS BIGINT) AS qty,
       ROUND(SUM(b.l_extendedprice), 2) AS revenue
FROM big b JOIN dim d ON b.hk = d.hk
GROUP BY b.hk, d.tier
""",
)
def q_join_skewed_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same Zipf-skewed join resolved by SALTING instead of AQE:
    the hot key's rows scatter over 16 (key, salt) reducers and the
    100-row dim replicates 16x — identical results (same oracle as
    q_join_skewed), no runtime re-planning required. This is the
    mitigation that also works where AQE cannot reach (streaming state
    joins, non-SMJ strategies)."""
    from ..functions.skew import salted_join

    big, dim = _skewed_sides(spark, sf_dir)
    j = salted_join(big, dim, on=["hk"], n_salts=16)
    return j.groupBy("hk", "tier").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("l_quantity").cast("long").alias("qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
    )


# ---- model-based quality filtering (classifier inference) -----------

_CLS_BUCKETS = 64
_CLS_HASH = (
    "CAST(((({key}) % 2147483648) * 2654435761 + 12345) % 4294967296"
    " AS BIGINT)"
)
_CLS_STRKEY = (
    "(ascii(substr({t}, 1, 1)) * 961"
    " + COALESCE(ascii(substr({t}, 2, 1)), 0) * 31 + length({t}))"
)
# deterministic signed integer weight per bucket (stands in for trained
# coefficients; at deploy time this 64-long array is the model)
_CLS_WEIGHT = (
    "CAST((({b}) * 2654435761 + 99991) % 4294967296 AS BIGINT)"
    " - 2147483648"
)


@register(
    "q_text_classifier_score",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest({TOKS_SQL}) AS t FROM documents),
h AS (
  SELECT doc_id,
         {_CLS_HASH.format(key=_CLS_STRKEY.format(t='t'))}
           % {_CLS_BUCKETS} AS b
  FROM tok),
s AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM({_CLS_WEIGHT.format(b='b')}) AS BIGINT) AS score_raw
  FROM h GROUP BY doc_id)
SELECT doc_id, n_tokens, score_raw,
       CAST(FLOOR(score_raw * 1.0 / n_tokens) AS BIGINT)
         AS score_per_token,
       score_raw > 0 AS keep
FROM s
""",
)
def q_text_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-classifier quality scoring — MODEL INFERENCE as a query:
    each document's hashed bag-of-words (the q_text_feature_hashing
    featurizer) is dotted with a broadcast weight vector and thresholded
    into a keep/drop label — the fastText-style model-based quality
    filter every LLM corpus pipeline runs after the heuristic pass
    (q_text_quality). Weights here are a deterministic integer function
    of the bucket id so the oracle can mirror the exact dot product; a
    trained model ships the same way — a {_CLS_BUCKETS}-entry broadcast
    array, swapped in without touching the plan.

    Exact-int design: per-token weights are signed 32-bit ints summed
    into BIGINT (no float summation-order hazard; score_per_token is
    floor division), so the label boundary is bit-identical across
    engines.

    Scale: explode -> hash -> partial-aggregable SUM per doc. One
    shuffle on doc_id; the model is O(buckets) broadcast state. At
    100 TB this is the cheapest inference shape there is — no Python,
    no UDF, whole-stage codegen end to end.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens_col()).alias("t"))
    b = (
        F.expr(_CLS_HASH.format(key=_CLS_STRKEY.format(t="t")))
        % _CLS_BUCKETS
    )
    s = tok.select("doc_id", b.alias("b")).groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.expr(_CLS_WEIGHT.format(b="b"))).alias("score_raw"),
    )
    return s.select(
        "doc_id",
        "n_tokens",
        "score_raw",
        F.floor(F.col("score_raw") / F.col("n_tokens"))
        .cast("long")
        .alias("score_per_token"),
        (F.col("score_raw") > 0).alias("keep"),
    )


_MIX_TEMP = 2.0  # temperature; T=1 reproduces raw shares, T->inf uniform
_MIX_BUDGET = 1_000_000  # sampled-token budget the shares allocate


@register(
    "q_mixture_temperature",
    oracle=f"""
WITH t AS (
  SELECT source,
         CAST(SUM(len({TOKS_SQL})) AS BIGINT) AS tokens
  FROM documents GROUP BY source),
s AS (
  SELECT source, tokens,
         tokens * 1.0 / SUM(tokens) OVER () AS p,
         POW(tokens * 1.0 / SUM(tokens) OVER (), 1.0 / {_MIX_TEMP})
           AS pt
  FROM t)
SELECT source, tokens,
       ROUND(p, 6) AS raw_share,
       ROUND(pt / SUM(pt) OVER (), 6) AS temp_share,
       ROUND({_MIX_BUDGET} * pt / SUM(pt) OVER () / tokens, 6)
         AS epochs
FROM s
""",
)
def q_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled corpus mixture (the multilingual-T5 / UNIMAX
    sampling rule): per-source share p_i is flattened to
    p_i^(1/T) / sum_j p_j^(1/T), pulling low-resource sources up
    without the uniform target's hard cliff (T=1 keeps raw shares,
    T->inf is uniform; q_mixture_weights is the uniform-target
    sibling). `epochs` converts the share into repetitions of each
    source under a fixed sampled-token budget — the number a data
    curator reads to spot sources that would be over-epoched (>4-5
    epochs of a small source degrades models; the fix is lowering T or
    the budget).

    Scale: one partial-aggregable token census per source; the share
    normalization is a window over the SOURCE census (rows = number of
    corpus sources, domain-bounded — the SCALE.md exemption), never
    the corpus. Everything stays JVM-side.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = docs.groupBy("source").agg(
        F.sum(F.size(tokens_col()).cast("long")).alias("tokens")
    )
    w = Window.partitionBy()
    p = F.col("tokens").cast("double") / F.sum("tokens").over(w)
    pt = F.pow(p, 1.0 / _MIX_TEMP)
    return t.select(
        "source",
        "tokens",
        F.round(p, 6).alias("raw_share"),
        F.round(pt / F.sum(pt).over(w), 6).alias("temp_share"),
        F.round(
            F.lit(_MIX_BUDGET) * pt / F.sum(pt).over(w) / F.col("tokens"),
            6,
        ).alias("epochs"),
    )


_RRF_K = 60  # the standard RRF damping constant (Cormack et al.)
_RRF_TOPN = 20  # depth of each ranker's candidate list
_RRF_QUERY = ("join", "hash", "scan")  # lexical probe terms


@register(
    "q_search_hybrid_rrf",
    oracle=f"""
WITH lex AS (
  SELECT doc_id,
         CAST(len(list_filter({TOKS_SQL},
                   t -> t IN ('join', 'hash', 'scan'))) AS BIGINT) AS hits
  FROM documents),
lex_top AS (
  SELECT doc_id, hits,
         row_number() OVER (ORDER BY hits DESC, doc_id) AS r
  FROM (SELECT * FROM lex ORDER BY hits DESC, doc_id LIMIT {_RRF_TOPN})),
p AS (SELECT embedding::DOUBLE[] AS pe FROM embeddings WHERE vec_id = 0),
vec_top AS (
  SELECT vec_id AS doc_id,
         row_number() OVER (
           ORDER BY list_cosine_similarity(embedding::DOUBLE[], pe) DESC,
                    vec_id) AS r
  FROM (
    SELECT e.vec_id, e.embedding, p.pe
    FROM embeddings e, p WHERE e.vec_id <> 0
    ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], p.pe) DESC,
             e.vec_id
    LIMIT {_RRF_TOPN})),
fused AS (
  SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id,
         CAST(COALESCE(1000000 // ({_RRF_K} + l.r), 0)
            + COALESCE(1000000 // ({_RRF_K} + v.r), 0) AS BIGINT)
           AS rrf_ppm,
         l.r AS lex_rank, v.r AS vec_rank
  FROM lex_top l FULL OUTER JOIN vec_top v ON l.doc_id = v.doc_id)
SELECT doc_id, rrf_ppm, lex_rank, vec_rank
FROM fused
ORDER BY rrf_ppm DESC, doc_id
LIMIT 10
""",
)
def q_search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HYBRID RETRIEVAL by reciprocal-rank fusion: a lexical ranker
    (probe-term hit count over documents) and a vector ranker (cosine
    to the vec_id=0 probe over embeddings) each produce a top-{_RRF_TOPN}
    list; candidates are fused with the standard RRF score
    sum 1/({_RRF_K} + rank) — accumulated in exact integer ppm so the
    fused ordering is engine-invariant — and the top-10 returned with
    both per-ranker ranks (NULL where a ranker missed the doc). This is
    the retrieval shape RAG/search stacks run (BM25 + ANN fused by
    RRF), expressed as two heap top-k selections + one {_RRF_TOPN}-row
    outer join.

    Scale: each ranker is a full-scan score + TakeOrdered heap (no
    global sort); ranks come from windows over the {_RRF_TOPN}-row
    candidate lists (k-bounded, the SCALE.md exemption); the fusion
    join touches 2x{_RRF_TOPN} rows regardless of corpus size. At
    100 TB the rankers swap in an inverted index and an IVF probe, and
    fusion is unchanged.
    """
    from ..functions.vectors import as_double_array, cosine_col

    docs = load_table(spark, sf_dir, "documents")
    hits = F.size(
        F.filter(
            tokens_col(), lambda t: t.isin([F.lit(q) for q in _RRF_QUERY])
        )
    ).cast("long")
    lex_top = (
        docs.select("doc_id", hits.alias("hits"))
        .orderBy(F.desc("hits"), F.asc("doc_id"))
        .limit(_RRF_TOPN)
    )
    lex_ranked = lex_top.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("hits"), F.asc("doc_id")))
        .alias("lr"),
    )
    emb = load_table(spark, sf_dir, "embeddings")
    probe = emb.filter(F.col("vec_id") == 0).select(
        as_double_array("embedding").alias("pe")
    )
    vec_top = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(probe))
        .select(
            F.col("vec_id").alias("doc_id"),
            cosine_col(as_double_array("embedding"), F.col("pe")).alias(
                "_c"
            ),
        )
        .orderBy(F.desc("_c"), F.asc("doc_id"))
        .limit(_RRF_TOPN)
    )
    vec_ranked = vec_top.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("_c"), F.asc("doc_id")))
        .alias("vr"),
    )
    rrf = (
        F.coalesce(
            F.floor(F.lit(1_000_000) / (F.lit(_RRF_K) + F.col("lr"))),
            F.lit(0),
        )
        + F.coalesce(
            F.floor(F.lit(1_000_000) / (F.lit(_RRF_K) + F.col("vr"))),
            F.lit(0),
        )
    ).cast("long")
    fused = lex_ranked.join(vec_ranked, "doc_id", "full_outer").select(
        "doc_id",
        rrf.alias("rrf_ppm"),
        F.col("lr").alias("lex_rank"),
        F.col("vr").alias("vec_rank"),
    )
    return fused.orderBy(F.desc("rrf_ppm"), F.asc("doc_id")).limit(10)


_NDCG_K = 10


@register(
    "q_eval_ndcg",
    oracle=f"""
WITH p AS (
  SELECT embedding::DOUBLE[] AS pe, label AS plabel
  FROM embeddings WHERE vec_id = 0),
top AS (
  SELECT e.vec_id, e.label, p.plabel,
         row_number() OVER (
           ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], p.pe)
                    DESC, e.vec_id) AS r
  FROM (
    SELECT e.vec_id, e.embedding, e.label
    FROM embeddings e, p WHERE e.vec_id <> 0
    ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], p.pe) DESC,
             e.vec_id
    LIMIT {_NDCG_K}) e, p),
rel AS (
  SELECT r, CASE WHEN label = plabel THEN 1 ELSE 0 END AS g FROM top),
dcg AS (
  SELECT SUM(g / log2(r + 1.0)) AS dcg,
         CAST(SUM(g) AS BIGINT) AS n_rel
  FROM rel),
ideal AS (
  SELECT SUM(1.0 / log2(rr + 1.0)) AS idcg
  FROM (SELECT unnest(range(1, (SELECT n_rel FROM dcg) + 1)) AS rr)),
res AS (SELECT dcg.dcg, dcg.n_rel, ideal.idcg FROM dcg, ideal)
SELECT CAST({_NDCG_K} AS BIGINT) AS k, n_rel,
       ROUND(dcg, 6) AS dcg,
       ROUND(COALESCE(idcg, 0.0), 6) AS idcg,
       ROUND(CASE WHEN COALESCE(idcg, 0) > 0 THEN dcg / idcg
                  ELSE 0.0 END, 6) AS ndcg
FROM res
""",
)
def q_eval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality EVALUATION: NDCG@{_NDCG_K} of the exact cosine
    ranker against label agreement with the probe (binary relevance:
    neighbor shares vec_id=0's label). DCG discounts each relevant hit
    by 1/log2(rank+1); IDCG is the same mass packed into the top ranks;
    their ratio is the position-sensitive quality number every ranking
    stack reports alongside recall (q_vector_eval_recall is the
    position-blind sibling). One output row: k, relevant count, DCG,
    IDCG, NDCG (6 dp — the only floats are the log discounts, summed
    over <= {_NDCG_K} terms).

    Scale: the candidate list is a heap top-k; every window/aggregate
    after it runs over {_NDCG_K} rows — evaluation cost is independent
    of corpus size. At 100 TB the same query evaluates an ANN index by
    swapping the ranker CTE (IVF/PQ variants), which is exactly how
    recall/NDCG sweeps are produced for index tuning.
    """
    from ..functions.vectors import as_double_array, cosine_col

    emb = load_table(spark, sf_dir, "embeddings")
    probe = emb.filter(F.col("vec_id") == 0).select(
        as_double_array("embedding").alias("pe"),
        F.col("label").alias("plabel"),
    )
    top = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(probe))
        .select(
            "vec_id",
            "label",
            "plabel",
            cosine_col(as_double_array("embedding"), F.col("pe")).alias(
                "_c"
            ),
        )
        .orderBy(F.desc("_c"), F.asc("vec_id"))
        .limit(_NDCG_K)
    )
    ranked = top.select(
        F.when(F.col("label") == F.col("plabel"), 1)
        .otherwise(0)
        .alias("g"),
        F.row_number()
        .over(Window.orderBy(F.desc("_c"), F.asc("vec_id")))
        .alias("r"),
    )
    agg = ranked.agg(
        F.sum(F.col("g") / F.log2(F.col("r") + 1.0)).alias("dcg"),
        F.sum("g").cast("long").alias("n_rel"),
    )
    # n_rel=0 guard: sequence(1, 0) auto-steps DOWN to [1, 0] and the
    # rr=0 term divides by log2(1)=0 → +Infinity, diverging from the
    # oracle's COALESCE(NULL, 0). Never build the sequence with
    # stop < start (ADVICE r5).
    ideal = agg.select(
        "dcg",
        "n_rel",
        F.when(
            F.col("n_rel") > 0,
            F.aggregate(
                F.sequence(F.lit(1), F.col("n_rel").cast("int")),
                F.lit(0.0),
                lambda acc, rr: acc + 1.0 / F.log2(rr.cast("double") + 1.0),
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("idcg"),
    )
    return ideal.select(
        F.lit(_NDCG_K).cast("long").alias("k"),
        "n_rel",
        F.round("dcg", 6).alias("dcg"),
        F.round(F.coalesce("idcg", F.lit(0.0)), 6).alias("idcg"),
        F.round(
            F.when(
                F.coalesce("idcg", F.lit(0.0)) > 0,
                F.col("dcg") / F.col("idcg"),
            ).otherwise(0.0),
            6,
        ).alias("ndcg"),
    )


_SPAN_LEN = 3  # mean/fixed corruption span length (T5 uses mean 3)
_SPAN_RATE_PCT = 15  # corrupt ~15% of tokens
_SPAN_HASH = (
    "CAST((((doc_id * 131 + {i}) % 2147483648) * 2654435761 + 12345)"
    " % 4294967296 AS BIGINT)"
)


@register(
    "q_text_span_corruption",
    oracle=f"""
WITH t AS (
  SELECT doc_id, CAST(len({TOKS_SQL}) AS BIGINT) AS n FROM documents),
d AS (
  SELECT doc_id, n,
         CAST(n * {_SPAN_RATE_PCT} // (100 * {_SPAN_LEN}) AS BIGINT)
           AS n_spans
  FROM t WHERE n >= 20),
sp AS (
  SELECT doc_id, n, n_spans, i,
         {_SPAN_HASH.format(i='i')} % (n - {_SPAN_LEN}) AS start
  FROM d, LATERAL (SELECT unnest(range(n_spans)) AS i)),
pos AS (
  SELECT DISTINCT doc_id, n, n_spans, start + o AS p
  FROM sp, LATERAL (SELECT unnest(range({_SPAN_LEN})) AS o)),
agg AS (
  SELECT doc_id, n, n_spans, CAST(COUNT(*) AS BIGINT) AS corrupted
  FROM pos GROUP BY doc_id, n, n_spans)
SELECT doc_id, n AS n_tokens, n_spans, corrupted,
       CAST(corrupted * 1000000 // n AS BIGINT) AS corrupt_ppm
FROM agg
""",
)
def q_text_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style SPAN-CORRUPTION manifest: for every document long
    enough to corrupt (>= 20 tokens), place n*{_SPAN_RATE_PCT}%/
    {_SPAN_LEN} deterministic {_SPAN_LEN}-token mask spans (span
    starts from the affine hash of (doc_id, span index), so every
    engine and every rerun masks identical positions — the same
    reproducibility contract as q_graph_random_walk and
    q_train_shard_manifest), and report the UNION of covered
    positions: overlapping spans must not double-count, so the
    manifest explodes spans to positions and distinct-counts them.
    This is the denoising-objective data layout (mask spans feed the
    encoder, span targets the decoder); downstream packing reuses
    q_pack_sequences.

    Scale: the explode is bounded by ~{_SPAN_RATE_PCT}% of corpus
    tokens; one distinct + one aggregate, both keyed by doc_id
    (partial-aggregable, single shuffle family). Integer-exact ppm.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", F.size(tokens_col()).cast("long").alias("n")
    ).filter(F.col("n") >= 20)
    d = t.select(
        "doc_id",
        "n",
        F.floor(F.col("n") * _SPAN_RATE_PCT / (100 * _SPAN_LEN))
        .cast("long")
        .alias("n_spans"),
    )
    sp = d.select(
        "doc_id",
        "n",
        "n_spans",
        F.explode(F.sequence(F.lit(0), F.col("n_spans") - 1)).alias("i"),
    ).select(
        "doc_id",
        "n",
        "n_spans",
        (
            F.expr(_SPAN_HASH.format(i="i")) % (F.col("n") - _SPAN_LEN)
        ).alias("start"),
    )
    pos = sp.select(
        "doc_id",
        "n",
        "n_spans",
        F.explode(
            F.sequence(F.col("start"), F.col("start") + _SPAN_LEN - 1)
        ).alias("p"),
    ).distinct()
    agg = pos.groupBy("doc_id", "n", "n_spans").agg(
        F.count(F.lit(1)).alias("corrupted")
    )
    return agg.select(
        "doc_id",
        F.col("n").alias("n_tokens"),
        "n_spans",
        "corrupted",
        F.floor(F.col("corrupted") * 1_000_000 / F.col("n"))
        .cast("long")
        .alias("corrupt_ppm"),
    )
