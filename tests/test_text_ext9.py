"""Repeated-span detection (Lee-et-al-style substring dedup signal):
structural invariants + the exact-duplicate full-coverage property."""

from __future__ import annotations

from pyspark.sql import functions as F

from nosql_triple_store_spark.operators.text_ext9 import (
    K_SPAN,
    q_text_dup_span_excision,
    q_text_dup_spans,
)

from .conftest import SF_DIR


def test_span_invariants(spark):
    rows = q_text_dup_spans(spark, SF_DIR).collect()
    assert rows, "empty span output"
    for r in rows:
        assert 0 <= r["dup_tokens"] <= r["n_tokens"]
        assert (r["n_spans"] == 0) == (r["dup_tokens"] == 0)
        # every span covers at least one full k-gram window
        if r["n_spans"]:
            assert r["dup_tokens"] >= K_SPAN * 1


def test_span_semantics_on_synthetic_corpus(spark):
    """Hand-built corpus with known answers: identical twins are fully
    covered; a doc quoting a K_SPAN-gram run of another shows exactly
    that span; unique text shows zero."""
    from nosql_triple_store_spark.operators.text_ext9 import dup_spans_over

    words = [f"w{i}" for i in range(30)]
    quoted = " ".join(words[:10])  # 10-token run, >= K_SPAN
    docs = spark.createDataFrame(
        [
            (1, " ".join(words)),  # twin A (30 tokens)
            (2, " ".join(words)),  # twin B
            (3, "alpha beta " + quoted + " gamma delta"),  # quotes 10 tokens
            (4, "zeta eta theta iota kappa lam mu nu xi omicron pi rho"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in dup_spans_over(docs).collect()}
    assert got[1]["dup_tokens"] == got[1]["n_tokens"] == 30
    assert got[2]["dup_tokens"] == got[2]["n_tokens"] == 30
    # doc 3: the quoted 10-token run is shared with docs 1/2 — exactly
    # one maximal span of 10 tokens ("alpha beta"/"gamma delta" break
    # the k-grams at the edges)
    assert got[3]["n_spans"] == 1 and got[3]["dup_tokens"] == 10
    assert got[4]["n_spans"] == 0 and got[4]["dup_tokens"] == 0
    # docs 1/2 additionally must count the quoted overlap INSIDE their
    # full-coverage span (no double count): dup_tokens == n_tokens only


def test_excision_manifest_consistent(spark):
    per_doc = q_text_dup_spans(spark, SF_DIR)
    m = q_text_dup_span_excision(spark, SF_DIR).collect()[0]
    agg = per_doc.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_tokens").alias("tok"),
        F.sum("dup_tokens").alias("dup"),
    ).collect()[0]
    assert m["n_docs"] == agg["n"]
    assert m["corpus_tokens"] == agg["tok"]
    assert m["excised_tokens"] == agg["dup"]
    assert m["kept_tokens"] == agg["tok"] - agg["dup"]
