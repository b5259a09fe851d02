"""Recall + composition invariants for the IVF-PQ search (rows-only
query: float ADC/argmin are ulp-engine-specific, so correctness is
pinned by recall against the exact baseline and by structural checks).
"""

from __future__ import annotations

from nosql_triple_store_spark.registry import all_specs

from .conftest import SF_DIR

SPECS = all_specs()


def test_ivfpq_recall_against_exact(spark):
    exact = [
        r.vec_id for r in SPECS["q_vector_knn"].fn(spark, SF_DIR).collect()
    ]
    approx = [
        r.vec_id for r in SPECS["q_vector_ivfpq"].fn(spark, SF_DIR).collect()
    ]
    assert len(approx) == 10
    assert len(set(approx)) == 10, "duplicate neighbors in result"
    recall = len(set(exact) & set(approx)) / len(exact)
    # learned k-means cells (nprobe=4 of 10) + residual-PQ shortlist:
    # the composed index must recover >= 9 of the exact top-10
    # (VERDICT r5 #1 done-bar; simulation gives 1.0 at fixture scale)
    assert recall >= 0.9, f"recall@10 {recall} below floor"


def test_ivfpq_never_beats_exact_scores(spark):
    exact = SPECS["q_vector_knn"].fn(spark, SF_DIR).collect()
    approx = SPECS["q_vector_ivfpq"].fn(spark, SF_DIR).collect()
    best_exact = max(r.cos_sim for r in exact)
    # the re-rank computes TRUE cosine, so no approx score can exceed
    # the true best; probe itself is excluded from both
    assert all(r.cos_sim <= best_exact + 1e-9 for r in approx)
    assert all(r.vec_id != 0 for r in approx)


def test_ivfpq_deterministic(spark):
    a = SPECS["q_vector_ivfpq"].fn(spark, SF_DIR).collect()
    b = SPECS["q_vector_ivfpq"].fn(spark, SF_DIR).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
