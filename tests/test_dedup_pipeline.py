"""q_dedup_pipeline: candidate recall floor + manifest invariants.

The pipeline's oracle is the EXACT clustering, which is only sound if
LSH candidate generation misses no pair at/above the verify threshold —
pin that here (deterministic: fixed hash seeds), plus the structural
invariants of the keep-one manifest."""

from __future__ import annotations

from pyspark.sql import functions as F

from nosql_triple_store_spark.catalog import load_table
from nosql_triple_store_spark.functions.textfns import shingles_col, tokens_col
from nosql_triple_store_spark.operators.dedup import _shingle_pairs
from nosql_triple_store_spark.operators.dedup_pipeline import (
    THRESHOLD,
    _minhash_candidates,
    q_dedup_pipeline,
)

from .conftest import SF_DIR


def test_candidates_cover_all_threshold_pairs(spark):
    docs = load_table(spark, SF_DIR, "documents")
    sh = docs.select(
        "doc_id", F.explode(shingles_col(tokens_col())).alias("shingle")
    )
    cand = {
        (r["doc_a"], r["doc_b"])
        for r in _minhash_candidates(sh).collect()
    }
    jac = F.col("common") * 1.0 / (
        F.col("na") + F.col("nb") - F.col("common")
    )
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in _shingle_pairs(spark, SF_DIR)
        .filter(jac >= THRESHOLD)
        .select("doc_a", "doc_b")
        .collect()
    }
    assert exact, "fixture has no threshold pairs — recall test is vacuous"
    missed = exact - cand
    assert not missed, f"LSH missed threshold pairs: {sorted(missed)[:5]}"


def test_manifest_invariants(spark):
    out = q_dedup_pipeline(spark, SF_DIR).collect()
    docs = {r["doc_id"] for r in out}
    assert len(out) == len(docs)  # one row per document
    reps = {r["cluster_id"] for r in out}
    by_id = {r["doc_id"]: r for r in out}
    for rep in reps:
        assert by_id[rep]["keep"] == 1  # each representative keeps itself
    for r in out:
        assert r["cluster_id"] <= r["doc_id"]  # rep is the min of cluster
        assert r["keep"] == (1 if r["doc_id"] == r["cluster_id"] else 0)
