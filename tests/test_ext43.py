"""Tests for the forty-third batch: DP noise bounds + reproducibility,
l-diversity mass conservation, streaming-quota = batch-quota identity."""

from __future__ import annotations

from pyspark.sql import functions as F

from nosql_triple_store_spark.catalog import load_table
from nosql_triple_store_spark.registry import all_specs

from .conftest import SF_DIR

SPECS = all_specs()


def test_dp_count_noise_bounded_and_reproducible(spark):
    rows = {
        r.event_type: r.noisy_count
        for r in SPECS["q_privacy_dp_count"].fn(spark, SF_DIR).collect()
    }
    true = {
        r.event_type: r["count"]
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .count()
        .collect()
    }
    assert set(rows) == set(true)
    for et, noisy in rows.items():
        # Laplace(b=1) via inverse CDF of u in [5e-7, 1-5e-7]:
        # |noise| <= ln(1e6) ~ 13.82
        assert abs(noisy - true[et]) <= 14.0
        assert noisy != true[et]  # noise actually applied
    again = {
        r.event_type: r.noisy_count
        for r in SPECS["q_privacy_dp_count"].fn(spark, SF_DIR).collect()
    }
    assert rows == again


def test_l_diversity_mass_conservation(spark):
    rows = SPECS["q_privacy_l_diversity"].fn(spark, SF_DIR).collect()
    n_cust = load_table(spark, SF_DIR, "customer").count()
    assert sum(r.n_rows for r in rows) == n_cust
    n_segments = (
        load_table(spark, SF_DIR, "customer")
        .select("c_mktsegment")
        .distinct()
        .count()
    )
    for r in rows:
        assert 1 <= r.l <= n_segments
        assert r.n_groups >= 1


def test_stream_quota_equals_batch_quota(spark):
    stream = {
        (r.event_type, r.rank): (r.event_id, r.tag)
        for r in SPECS["q_stream_quota_sample"].fn(spark, SF_DIR).collect()
    }
    batch = {
        (r.event_type, r.rank): (r.event_id, r.tag)
        for r in SPECS["q_sample_group_quota"].fn(spark, SF_DIR).collect()
    }
    assert stream == batch
