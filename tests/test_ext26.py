"""Targeted checks for batch 26: repetition signals, contamination,
rolling median, compaction, k-means invariants."""

from __future__ import annotations

import glob

from nosql_triple_store_spark.catalog import load_table
from nosql_triple_store_spark.operators.relational_ext26 import (
    _COMPACT_TARGET,
    compact_dir,
    q_text_contamination,
    q_text_repetition,
)
from nosql_triple_store_spark.operators.vector_ext4 import (
    K,
    _assign,
    kmeans_fit,
)

from .conftest import SF_DIR


def test_repetition_manual_crosscheck(spark):
    """Recompute one document's signals in plain Python."""
    docs = load_table(spark, SF_DIR, "documents")
    row = docs.orderBy("doc_id").first()
    toks = [t for t in row.text.lower().split(" ") if t]
    bigrams = [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
    from collections import Counter

    c = Counter(bigrams)
    got = {
        r.doc_id: r
        for r in q_text_repetition(spark, SF_DIR)
        .filter(f"doc_id = {row.doc_id}")
        .collect()
    }[row.doc_id]
    assert got.n_bigrams == len(bigrams)
    assert got.n_distinct == len(c)
    assert got.dup_frac == round(1.0 - len(c) / len(bigrams), 4)
    assert got.top_frac == round(max(c.values()) / len(bigrams), 4)


def test_contamination_bounds_and_nonvacuity(spark):
    rows = q_text_contamination(spark, SF_DIR).collect()
    assert rows, "no training docs scored"
    assert all(0.0 <= r.contamination <= 1.0 for r in rows)
    assert all(r.n_contaminated <= r.n_shingles for r in rows)
    # the shared vocabulary makes SOME overlap with the benchmark slice
    # inevitable; a uniformly-zero result would mean a broken join
    assert any(r.n_contaminated > 0 for r in rows)
    # only even doc_ids are training docs
    assert all(r.doc_id % 2 == 0 for r in rows)


def test_compaction_reduces_files_preserving_rows(spark):
    small, compacted = compact_dir(spark, SF_DIR)
    n_small = len(glob.glob(f"{small}/part-*.parquet"))
    n_comp = len(glob.glob(f"{compacted}/part-*.parquet"))
    assert n_comp <= _COMPACT_TARGET < n_small
    ev = load_table(spark, SF_DIR, "events")
    assert spark.read.parquet(compacted).count() == ev.count()


def test_kmeans_lloyd_invariants(spark):
    centroids, inertias = kmeans_fit(spark, SF_DIR)
    assert len(centroids) == K
    # Lloyd monotonicity: each assign+update step never increases inertia
    # (1e-9 relative slack for float summation order)
    for a, b in zip(inertias, inertias[1:]):
        assert b <= a * (1 + 1e-9), inertias
    # final assignment is the argmin of the final centroids, and every
    # point lands in a valid cluster
    emb = load_table(spark, SF_DIR, "embeddings")
    assigned = _assign(emb, centroids)
    n = emb.count()
    assert assigned.count() == n
    assert assigned.filter(f"cid < 0 or cid >= {K}").count() == 0
    # spot-check one vector's argmin in plain Python
    r = assigned.orderBy("vec_id").first()
    dists = [
        sum((float(a) - b) * (float(a) - b) for a, b in zip(r.embedding, c))
        for c in centroids
    ]
    assert r.cid == dists.index(min(dists))
