"""Tests for the forty-second batch: binary-quant recall vs exact KNN,
delta-method sanity, CUPED reduction bounds."""

from __future__ import annotations

import numpy as np

from nosql_triple_store_spark.registry import all_specs

from .conftest import SF_DIR

SPECS = all_specs()


def test_binary_quant_recall_vs_exact(spark):
    """1-bit shortlist + rerank must recover most of the exact top-10
    (sign patterns of random vectors preserve cosine neighborhoods;
    recall floor 0.5 is deliberately loose but catches a broken pack
    or xor path, which scores ~0.1 at random)."""
    bq = [r.vec_id for r in SPECS["q_vector_binary_quant"].fn(spark, SF_DIR).collect()]
    exact = [r.vec_id for r in SPECS["q_vector_knn"].fn(spark, SF_DIR).collect()]
    recall = len(set(bq) & set(exact)) / len(exact)
    assert recall >= 0.5, (recall, bq, exact)


def test_binary_quant_hamming_bounds(spark):
    rows = SPECS["q_vector_binary_quant"].fn(spark, SF_DIR).collect()
    assert len(rows) == 10
    for r in rows:
        assert 0 <= r.hamming <= 64
        assert -1.0 <= r.cos_sim <= 1.0


def test_delta_method_sanity(spark):
    r = SPECS["q_agg_delta_method"].fn(spark, SF_DIR).first()
    assert r.n >= 1
    assert r.ratio > 0  # revenue per purchase is positive
    assert r.var_delta >= 0
    assert abs(r.se_delta - np.sqrt(r.var_delta)) < 1e-3


def test_cuped_reduction_bounds(spark):
    r = SPECS["q_events_cuped"].fn(spark, SF_DIR).first()
    # variance can only shrink, by exactly rho^2
    assert r.var_cuped <= r.var_post + 1e-9
    assert 0 <= r.reduction_ppm <= 1_000_000


def test_eval_recall_bounds_and_determinism(spark):
    rows = {
        r.probe_id: r
        for r in SPECS["q_vector_eval_recall"].fn(spark, SF_DIR).collect()
    }
    assert len(rows) == 8
    for r in rows.values():
        assert r.n_exact == 10
        assert 0 <= r.n_hit <= r.n_exact
        assert r.recall_ppm == r.n_hit * 1_000_000 // r.n_exact
    # the sign patterns of random embeddings preserve neighborhoods:
    # average recall floor mirrors test_binary_quant_recall_vs_exact
    avg = sum(r.recall_ppm for r in rows.values()) / len(rows)
    assert avg >= 400_000, avg
    again = {
        r.probe_id: r.recall_ppm
        for r in SPECS["q_vector_eval_recall"].fn(spark, SF_DIR).collect()
    }
    assert {p: r.recall_ppm for p, r in rows.items()} == again
