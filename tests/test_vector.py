"""Recall of the approximate IVF search against the exact brute-force
top-k (the rows-only query's semantic evidence)."""

from __future__ import annotations

from nosql_triple_store_spark.registry import all_specs

from .conftest import SF_DIR

SPECS = all_specs()


def test_ivf_recall_vs_exact(spark):
    exact = [r["vec_id"] for r in SPECS["q_vector_knn"].fn(spark, SF_DIR).collect()]
    approx = [
        r["vec_id"] for r in SPECS["q_vector_knn_ivf"].fn(spark, SF_DIR).collect()
    ]
    assert len(approx) == 10
    recall = len(set(exact) & set(approx)) / len(exact)
    # probing 3/10 cells of random-ish 64-dim vectors: recall is data-
    # dependent; require a sane floor and record the value in the assert
    assert recall >= 0.3, f"IVF recall too low: {recall} exact={exact} approx={approx}"


def test_knn_excludes_probe_and_sorted(spark):
    rows = SPECS["q_vector_knn"].fn(spark, SF_DIR).collect()
    assert all(r["vec_id"] != 0 for r in rows)
    sims = [r["cos_sim"] for r in rows]
    assert sims == sorted(sims, reverse=True)
