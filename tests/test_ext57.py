"""Invariant tests for the round-5 batch (relational_ext57): skewed
joins are oracle-checked in tests/test_skew_data.py; here the mixture,
fusion, and evaluation operators get their mathematical contracts."""

from __future__ import annotations

from nosql_triple_store_spark.registry import all_specs

from .conftest import SF_DIR

SPECS = all_specs()


def test_mixture_temperature_flattens_shares(spark):
    rows = SPECS["q_mixture_temperature"].fn(spark, SF_DIR).collect()
    assert rows
    assert abs(sum(r.raw_share for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.temp_share for r in rows) - 1.0) < 1e-4
    # T>1 compresses toward uniform: the largest source loses share,
    # the smallest gains (strict when shares differ)
    big = max(rows, key=lambda r: r.raw_share)
    small = min(rows, key=lambda r: r.raw_share)
    if big.raw_share > small.raw_share + 1e-9:
        assert big.temp_share < big.raw_share
        assert small.temp_share > small.raw_share
    # epochs = budget * share / tokens, all positive
    for r in rows:
        assert r.epochs > 0


def test_rrf_rewards_agreement(spark):
    rows = SPECS["q_search_hybrid_rrf"].fn(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 10
    maxima = 1_000_000 // 61  # rank-1 contribution in ppm
    for r in rows:
        assert r.lex_rank is not None or r.vec_rank is not None
        assert 0 < r.rrf_ppm <= 2 * maxima
        # a doc present in BOTH lists must outscore any single-list doc
        # whose best rank is no better
    both = [r for r in rows if r.lex_rank and r.vec_rank]
    single = [r for r in rows if (r.lex_rank is None) != (r.vec_rank is None)]
    if both and single:
        best_single = max(
            1_000_000 // (60 + (r.lex_rank or r.vec_rank)) for r in single
        )
        assert max(r.rrf_ppm for r in both) >= best_single


def test_ndcg_bounds_and_ideal_dominates(spark):
    r = SPECS["q_eval_ndcg"].fn(spark, SF_DIR).collect()[0]
    assert r.k == 10
    assert 0 <= r.n_rel <= 10
    assert r.dcg <= r.idcg + 1e-9  # ideal ordering dominates
    assert 0.0 <= r.ndcg <= 1.0 + 1e-9
    if r.n_rel == 0:
        assert r.ndcg == 0.0


def test_classifier_label_is_score_sign(spark):
    rows = SPECS["q_text_classifier_score"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.keep == (r.score_raw > 0)
        assert r.n_tokens > 0
