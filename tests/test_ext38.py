"""Tests for the thirty-eighth batch: batch-KNN vs single-probe
agreement, mixture-sampling rebalance property, boilerplate threshold,
inverse-path membership."""

from __future__ import annotations

from pyspark.sql import functions as F

from nosql_triple_store_spark.plans.bgp import triples_view
from nosql_triple_store_spark.registry import all_specs

from .conftest import SF_DIR

SPECS = all_specs()


def test_knn_batch_agrees_with_single_probe(spark):
    """Probe 0's batch top-3 equals the head of q_vector_knn's exact
    top-10 (modulo the rounded-score tie policy both now share)."""
    batch = {
        (r.rnk, r.vec_id): r.cos_sim
        for r in SPECS["q_vector_knn_batch"].fn(spark, SF_DIR).collect()
        if r.probe_id == 0
    }
    single = SPECS["q_vector_knn"].fn(spark, SF_DIR).collect()
    head = [(i + 1, r.vec_id) for i, r in enumerate(single[:3])]
    assert set(batch) == set(head), (sorted(batch), head)


def test_sample_apply_rebalances_toward_uniform(spark):
    rows = SPECS["q_train_sample_apply"].fn(spark, SF_DIR).collect()
    assert rows, "sampler kept nothing"
    total_ppm = sum(r.achieved_ppm for r in rows)
    # integer-division flooring only ever loses ppm
    assert total_ppm <= 1_000_000
    for r in rows:
        assert 0 < r.weight_ppm <= 1_000_000
        assert r.kept_docs >= 1
    # the achieved spread must not exceed the uniform target by much
    # more than the original spread did (down-sampling can't overshoot)
    achieved = [r.achieved_ppm for r in rows]
    n_src = len(rows)
    assert max(achieved) <= 2 * 1_000_000 // n_src + 1_000_000 // 10


def test_boilerplate_threshold(spark):
    rows = SPECS["q_text_boilerplate"].fn(spark, SF_DIR).collect()
    for r in rows:
        assert r.n_boiler_tokens >= 1
        assert r.boiler_doc_hits >= r.n_boiler_tokens
        assert r.sample_token


def test_path_inverse_members_share_nation(spark):
    peers = {
        r.peer for r in SPECS["q_bgp_path_inverse"].fn(spark, SF_DIR).collect()
    }
    t = triples_view(spark, SF_DIR)
    nation = (
        t.filter((F.col("s") == "supplier:5") & (F.col("p") == "inNation"))
        .first()
        .o
    )
    expected = {
        r.s
        for r in t.filter(
            (F.col("p") == "inNation") & (F.col("o") == nation)
        ).collect()
    } - {"supplier:5"}
    assert peers == expected
