"""Text-analysis building blocks shared by Spark plans AND their DuckDB
oracles (the stopword lists / regexes / shingle rules live once here, so
both sides are provably the same heuristic).

Everything is built-in expressions (codegen'd, no Python UDF): tokenize =
split, shingles = transform/slice over the token array, language-ID =
array_intersect hit counts, fingerprint = md5 over a normalized form.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Deterministic heuristic stopword lists (public common-word lists).
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"],
    "fr": ["le", "les", "et", "est", "une", "des", "que", "pour", "dans", "sur"],
    "es": ["el", "los", "y", "es", "una", "por", "como", "para", "con", "su"],
}

# BPE-ish tokenizer regex: letter runs, digit runs, single punctuation.
BPE_REGEX = "[a-z]+|[0-9]+|[^a-z0-9 ]"

NORMALIZE_STRIP_REGEX = "[^a-z0-9 ]"


def sql_list(words: list[str]) -> str:
    """Render a python list as a SQL string-array literal."""
    inner = ", ".join(f"'{w}'" for w in words)
    return f"[{inner}]"


def tokens_col(text: str = "text") -> Column:
    """Whitespace tokens, lowercased, empties removed."""
    return F.filter(F.split(F.lower(F.col(text)), " "), lambda t: t != "")


def shingles_col(toks: Column, k: int = 3) -> Column:
    """Distinct k-token shingles joined by spaces; [] when < k tokens.

    The CASE guard matters: Spark's sequence(1, n) produces a DESCENDING
    sequence when n < 1 instead of an empty array.
    """
    return F.when(F.size(toks) < k, F.array().cast("array<string>")).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (k - 1)),
                lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
            )
        )
    )


def lang_hits_col(toks: Column, lang: str) -> Column:
    """Distinct-stopword hit count for one language."""
    lits = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.array_intersect(toks, lits))


def normalized_text_col(text: str = "text") -> Column:
    """lower → strip non-alnum → collapse runs of spaces → trim."""
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text)), NORMALIZE_STRIP_REGEX, ""),
            " +",
            " ",
        )
    )


# --- matching DuckDB SQL fragments -------------------------------------

TOKS_SQL = "list_filter(str_split(lower(text), ' '), t -> t <> '')"


def shingles_sql(toks_expr: str, k: int = 3) -> str:
    """DuckDB expression mirroring shingles_col (1-based slices)."""
    return (
        f"list_distinct([array_to_string(({toks_expr})[i:i+{k - 1}], ' ') "
        f"for i in range(1, len({toks_expr}) - {k - 2})])"
    )


def lang_hits_sql(toks_expr: str, lang: str) -> str:
    return f"len(list_intersect({toks_expr}, {sql_list(STOPWORDS[lang])}))"


NORMALIZED_TEXT_SQL = (
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),"
    " ' +', ' ', 'g'))"
)
