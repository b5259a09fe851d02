"""Text-analysis operators for LLM training-data pipelines: token stats,
language-ID, quality scoring, token counting, document fingerprinting
(task brief; operates on the `documents` table).

All heuristics are defined once in functions/textfns.py and rendered into
BOTH the Spark plan and the DuckDB oracle, so every query here is
oracle-checked (no rows-only escapes). No Python UDFs: tokenization,
regex counting, md5, and array intersections are codegen'd built-ins that
scale linearly with one shuffle (or none) per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.textfns import (
    BPE_REGEX,
    NORMALIZED_TEXT_SQL,
    STOPWORDS,
    TOKS_SQL,
    lang_hits_col,
    lang_hits_sql,
    normalized_text_col,
    sql_list,
    tokens_col,
)
from ..registry import register
from ..widths import fanout_width


@register(
    "q_text_tokens",
    oracle=f"""
WITH tok AS (SELECT unnest({TOKS_SQL}) AS token FROM documents)
SELECT token, CAST(COUNT(*) AS BIGINT) AS n
FROM tok GROUP BY token ORDER BY n DESC, token LIMIT 20
""",
)
def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 token frequencies: split → explode → count → top-k.
    TakeOrdered top-k after a partial-aggregated count — the full word-count
    shuffle is on distinct tokens only."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens_col()).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(20)
    )


@register(
    "q_text_stats",
    oracle="""
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(AVG(n_chars), 2) AS avg_chars,
       MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
FROM documents GROUP BY lang
""",
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus statistics."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


def _langid_case_sql() -> str:
    hits = {lang: lang_hits_sql("t", lang) for lang in STOPWORDS}
    return f"""
CASE WHEN greatest({hits['en']}, {hits['de']}, {hits['fr']}, {hits['es']}) = 0
     THEN 'unk'
     WHEN {hits['en']} >= {hits['de']} AND {hits['en']} >= {hits['fr']}
          AND {hits['en']} >= {hits['es']} THEN 'en'
     WHEN {hits['de']} >= {hits['fr']} AND {hits['de']} >= {hits['es']}
     THEN 'de'
     WHEN {hits['fr']} >= {hits['es']} THEN 'fr'
     ELSE 'es' END
"""


@register(
    "q_text_langid",
    oracle=f"""
WITH toks AS (SELECT doc_id, lang, {TOKS_SQL} AS t FROM documents)
SELECT pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN pred_lang = lang THEN 1 ELSE 0 END) AS BIGINT)
         AS n_label_agree
FROM (SELECT doc_id, lang, {_langid_case_sql()} AS pred_lang FROM toks)
GROUP BY pred_lang
""",
)
def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram/stopword language-ID heuristic: per-language distinct-hit
    counts, argmax with deterministic tie order en>de>fr>es, 'unk' on zero
    hits. Pure array_intersect expressions — one scan, no shuffle until
    the tiny per-language rollup."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_col()
    hits = {lang: lang_hits_col(toks, lang) for lang in STOPWORDS}
    pred = (
        F.when(
            F.greatest(hits["en"], hits["de"], hits["fr"], hits["es"]) == 0,
            F.lit("unk"),
        )
        .when(
            (hits["en"] >= hits["de"])
            & (hits["en"] >= hits["fr"])
            & (hits["en"] >= hits["es"]),
            F.lit("en"),
        )
        .when((hits["de"] >= hits["fr"]) & (hits["de"] >= hits["es"]), F.lit("de"))
        .when(hits["fr"] >= hits["es"], F.lit("fr"))
        .otherwise(F.lit("es"))
    )
    return (
        docs.select("lang", pred.alias("pred_lang"))
        .groupBy("pred_lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(F.col("pred_lang") == F.col("lang"), 1).otherwise(0)
            ).alias("n_label_agree"),
        )
    )


_ALL_STOPWORDS = sorted({w for ws in STOPWORDS.values() for w in ws})


@register(
    "q_text_quality",
    oracle=f"""
WITH t AS (
  SELECT doc_id, {TOKS_SQL} AS toks,
         length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g'))
           AS n_punct,
         length(text) AS n_len
  FROM documents),
m AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         len(list_filter(toks,
             x -> list_contains({sql_list(_ALL_STOPWORDS)}, x))) AS n_stop,
         n_punct, n_len
  FROM t WHERE len(toks) > 0)
SELECT doc_id, n_tokens,
       ROUND(n_stop * 1.0 / n_tokens, 4) AS stop_ratio,
       ROUND(n_punct * 1.0 / n_len, 4) AS punct_ratio,
       ROUND(0.5 * (n_stop * 1.0 / n_tokens)
             + 0.5 * (1 - n_punct * 1.0 / n_len), 4) AS quality_score
FROM m
""",
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: stopword ratio + punctuation ratio → blended score
    (the classic cheap pre-filter for LLM corpus cleaning)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_col()
    stop_lits = F.array(*[F.lit(w) for w in _ALL_STOPWORDS])
    t = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(
            F.filter(toks, lambda x: F.array_contains(stop_lits, x))
        ).alias("n_stop"),
        F.length(
            F.regexp_replace(F.lower(F.col("text")), "[a-z0-9 ]", "")
        ).alias("n_punct"),
        F.length("text").alias("n_len"),
    ).filter(F.col("n_tokens") > 0)
    stop_ratio = F.col("n_stop") * 1.0 / F.col("n_tokens")
    punct_ratio = F.col("n_punct") * 1.0 / F.col("n_len")
    return t.select(
        "doc_id",
        "n_tokens",
        F.round(stop_ratio, 4).alias("stop_ratio"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(0.5 * stop_ratio + 0.5 * (1 - punct_ratio), 4).alias(
            "quality_score"
        ),
    )


@register(
    "q_text_token_count",
    oracle=f"""
SELECT doc_id,
       CAST(len({TOKS_SQL}) AS BIGINT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(lower(text), '{BPE_REGEX}'))
            AS BIGINT) AS n_bpe_tokens,
       CAST(length(text) AS BIGINT) AS n_chars_actual
FROM documents
""",
)
def q_text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace split and a BPE-ish regex
    (letter runs / digit runs / single punctuation)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(tokens_col()).cast("long").alias("n_ws_tokens"),
        F.size(
            F.expr(f"regexp_extract_all(lower(text), '{BPE_REGEX}', 0)")
        ).cast("long").alias("n_bpe_tokens"),
        F.length("text").cast("long").alias("n_chars_actual"),
    )


_WINNOW_K = 8  # k-gram length (chars)
_WINNOW_W = 4  # winnowing window (positions)
_WINNOW_BASE = 31

# polynomial k-gram hash Σ ascii(char_j)·31^j, written once and rendered
# into both engines; literals carry explicit BIGINT casts because 31^6
# products overflow DuckDB's default INT32 arithmetic
_POWS = [_WINNOW_BASE**j for j in range(_WINNOW_K)]


def _gram_hash_sql(s: str, i: str) -> str:
    terms = [
        f"ascii(substr({s}, {i} + {j}, 1)) * ({p}::BIGINT)"
        for j, p in enumerate(_POWS)
    ]
    return " + ".join(terms)


_WINNOW_ORACLE = f"""
WITH n AS (
  SELECT doc_id, regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS s
  FROM documents),
pos AS (
  SELECT doc_id, s, CAST(unnest(range(1, len(s) - {_WINNOW_K - 2})) AS INT)
           AS i
  FROM n WHERE len(s) >= {_WINNOW_K}),
h AS (SELECT doc_id, i, {_gram_hash_sql("s", "i")} AS gh FROM pos),
w AS (
  SELECT doc_id, i, min(gh) OVER (PARTITION BY doc_id ORDER BY i
           ROWS BETWEEN CURRENT ROW AND {_WINNOW_W - 1} FOLLOWING) AS fp,
         max(i) OVER (PARTITION BY doc_id) AS max_i
  FROM h)
SELECT DISTINCT doc_id, fp FROM w WHERE i <= max_i - {_WINNOW_W - 1}
"""


@register("q_text_winnow", oracle=_WINNOW_ORACLE)
def q_text_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (the MOSS algorithm): polynomial
    rolling hashes of char 8-grams over the normalized text, then the
    minimum hash of every 4-position window — each document yields a
    sparse, position-robust fingerprint set for plagiarism/near-dup
    detection. Pure expressions: posexplode positions, an explicit
    8-term polynomial (identical literals both engines), one window min.
    Scale: output is ~len/w fingerprints per doc; the explode is bounded
    by text length and happens after the normalization projection."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]", "")
    base = docs.select("doc_id", norm.alias("s")).filter(
        F.length("s") >= _WINNOW_K
    )
    # the documents fixture is one parquet file -> one scan partition; the
    # len(s)-sized explode below would otherwise run in a single task
    # (measured at sf0.1: 8.7 s -> 1.6 s with the spread)
    base = base.repartition(fanout_width(spark))
    pos = base.select(
        "doc_id",
        "s",
        F.explode(
            F.sequence(F.lit(1), F.length("s") - (_WINNOW_K - 1))
        ).alias("i"),
    )
    # ascii() is INT; cast before multiplying — 31^6-scale products
    # overflow 32-bit under Spark 4's default ANSI arithmetic
    terms = [
        F.ascii(F.expr(f"substr(s, i + {j}, 1)")).cast("long") * F.lit(p)
        for j, p in enumerate(_POWS)
    ]
    expr = terms[0]
    for t in terms[1:]:
        expr = expr + t
    h = pos.select("doc_id", "i", expr.cast("long").alias("gh"))
    w_min = (
        Window.partitionBy("doc_id")
        .orderBy("i")
        .rowsBetween(Window.currentRow, _WINNOW_W - 1)
    )
    w_all = Window.partitionBy("doc_id")
    w = h.select(
        "doc_id",
        "i",
        F.min("gh").over(w_min).alias("fp"),
        F.max("i").over(w_all).alias("max_i"),
    )
    return (
        w.filter(F.col("i") <= F.col("max_i") - (_WINNOW_W - 1))
        .select("doc_id", "fp")
        .distinct()
    )


@register(
    "q_text_fingerprint",
    oracle=f"""
SELECT doc_id, md5({NORMALIZED_TEXT_SQL}) AS fingerprint,
       CAST(length({NORMALIZED_TEXT_SQL}) AS BIGINT) AS n_norm_chars
FROM documents
""",
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-robust document fingerprint: lower → strip
    punctuation → collapse whitespace → md5. The key for fuzzy-exact
    dedup across formatting variants."""
    docs = load_table(spark, sf_dir, "documents")
    norm = normalized_text_col()
    return docs.select(
        "doc_id",
        F.md5(norm).alias("fingerprint"),
        F.length(norm).cast("long").alias("n_norm_chars"),
    )
