"""Numpy-differential tests for q_vector_pca (vector_ext6.py) — the
rows-only query's fitted component is checked against numpy's exact
eigendecomposition of the same data, plus determinism and census
consistency."""

from __future__ import annotations

import numpy as np

from nosql_triple_store_spark.catalog import load_table
from nosql_triple_store_spark.operators.vector_ext6 import (
    pca_scatter_fit,
    q_vector_pca,
)

from .conftest import SF_DIR


def _numpy_reference(spark):
    rows = (
        load_table(spark, SF_DIR, "embeddings").select("embedding").collect()
    )
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    Xc = X - X.mean(axis=0)
    evals, evecs = np.linalg.eigh(Xc.T @ Xc)
    return X, evals[-1], evecs[:, -1]


def test_matches_numpy_eigendecomposition(spark):
    X, top_val, top_vec = _numpy_reference(spark)
    mu, v, lam = pca_scatter_fit(spark, SF_DIR)
    np.testing.assert_allclose(mu, X.mean(axis=0), rtol=1e-9)
    # One-pass scatter + eigh is exact up to float-sum association:
    # eigenvalue to 1e-9 relative, component alignment to 1e-6.
    assert abs(lam - top_val) <= 1e-9 * top_val
    align = abs(float(np.dot(v, top_vec)))
    assert align > 1 - 1e-6
    # Unit norm + pinned sign.
    assert abs(sum(t * t for t in v) - 1.0) < 1e-9
    peak = max(range(len(v)), key=lambda i: abs(v[i]))
    assert v[peak] > 0


def test_census_deterministic_and_consistent(spark):
    a = {r.label: r for r in q_vector_pca(spark, SF_DIR).collect()}
    b = {r.label: r for r in q_vector_pca(spark, SF_DIR).collect()}
    assert set(a) == set(b) and len(a) > 0
    for k in a:
        assert a[k].n_vectors == b[k].n_vectors
        assert a[k].mean_score == b[k].mean_score
    total = sum(r.n_vectors for r in a.values())
    n_emb = load_table(spark, SF_DIR, "embeddings").count()
    assert total == n_emb


def test_whitening_gives_identity_covariance(spark):
    from nosql_triple_store_spark.operators.vector_ext6 import (
        pca_whiten_fit,
        q_vector_whiten,
    )

    rows = (
        load_table(spark, SF_DIR, "embeddings").select("embedding").collect()
    )
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    mu, w = pca_whiten_fit(spark, SF_DIR)
    W = np.array(w)
    Y = (X - np.array(mu)) @ W.T
    cov = np.cov(Y, rowvar=False)
    np.testing.assert_allclose(cov, np.eye(X.shape[1]), atol=1e-6)
    # census self-check: E[||Wx||^2] = d for the fitted sample
    out = q_vector_whiten(spark, SF_DIR).collect()
    n = sum(r.n_vectors for r in out)
    mean_all = sum(r.n_vectors * r.mean_whitened_norm2 for r in out) / n
    d = X.shape[1]
    # sample identity: sum ||y_i||^2 = (n-1) * d exactly (trace of cov)
    assert abs(mean_all - (n - 1) * d / n) < 0.05
