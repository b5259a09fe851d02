"""Property test: the shared text heuristics (functions/textfns.py) must
produce IDENTICAL results in Spark and DuckDB on arbitrary strings — this
is the foundation every text-query oracle stands on, checked beyond the
fixture corpus."""

from __future__ import annotations

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from nosql_triple_store_spark.functions.textfns import (
    NORMALIZED_TEXT_SQL,
    STOPWORDS,
    TOKS_SQL,
    lang_hits_col,
    lang_hits_sql,
    normalized_text_col,
    tokens_col,
)

# printable-ascii strings with words, punctuation, repeats, empties
_word = st.sampled_from(
    ["the", "und", "les", "los", "data", "spark!", "a,b", "x", "", "  ",
     "THE", "Der", "123", "#!?", "para", "pour den"]
)
_text = st.lists(_word, min_size=0, max_size=12).map(" ".join)


@settings(
    max_examples=6, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(texts=st.lists(_text, min_size=1, max_size=15))
def test_tokenize_normalize_langhits_match_duckdb(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r["doc_id"]: (r["n_toks"], r["norm"], r["h_en"], r["h_de"])
        for r in df.select(
            "doc_id",
            F.size(tokens_col()).alias("n_toks"),
            normalized_text_col().alias("norm"),
            lang_hits_col(tokens_col(), "en").alias("h_en"),
            lang_hits_col(tokens_col(), "de").alias("h_de"),
        ).collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id INT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in con.execute(
            f"""
SELECT doc_id, CAST(len({TOKS_SQL}) AS INT), {NORMALIZED_TEXT_SQL},
       CAST({lang_hits_sql(TOKS_SQL, "en")} AS INT),
       CAST({lang_hits_sql(TOKS_SQL, "de")} AS INT)
FROM documents"""
        ).fetchall()
    }
    con.close()
    assert got == want, f"texts={texts}"


def test_stopword_lists_disjoint_enough():
    """Sanity: no language's list is a subset of another's (the argmax
    would never pick the subset language)."""
    for a in STOPWORDS:
        for b in STOPWORDS:
            if a != b:
                assert not set(STOPWORDS[a]) <= set(STOPWORDS[b])
