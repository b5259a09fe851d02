"""Targeted checks for the nineteenth extension batch."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from nosql_triple_store_spark.catalog import load_table
from nosql_triple_store_spark.operators.relational_ext19 import (
    q_events_abtest,
    q_text_zipf,
    q_vector_stats,
)

from .conftest import SF_DIR


def test_vector_stats_match_python_fold(spark):
    """The JVM higher-order fold must equal a Python sequential fold
    bit-for-bit on a sample of vectors."""
    emb = {r.vec_id: r.embedding for r in
           load_table(spark, SF_DIR, "embeddings").limit(20).collect()}
    got = {r.vec_id: r for r in
           q_vector_stats(spark, SF_DIR).filter(F.col("vec_id") < 20).collect()}
    for vid, v in emb.items():
        acc = 0.0
        acc2 = 0.0
        for x in v:
            acc += float(x)
            acc2 += float(x) * float(x)
        r = got[vid]
        assert r.vsum == acc, (vid, r.vsum, acc)
        assert r.norm2 == acc2
        assert r.vmin == min(float(x) for x in v)
        assert r.vmax == max(float(x) for x in v)


def test_abtest_z_is_finite_and_consistent(spark):
    r = q_events_abtest(spark, SF_DIR).collect()[0]
    assert r.n_control > 0 and r.n_treatment > 0
    assert 0.0 <= r.conv_control <= 1.0 and 0.0 <= r.conv_treatment <= 1.0
    assert math.isfinite(r.z_score)
    # sign agrees with the conversion difference
    if r.conv_treatment != r.conv_control:
        assert (r.z_score > 0) == (r.conv_treatment > r.conv_control)


def test_zipf_slope_negative(spark):
    """Frequency must decay with rank — the fitted slope is negative."""
    r = q_text_zipf(spark, SF_DIR).collect()[0]
    assert r.n_points > 10  # sf0.001 corpus has a ~31-token vocabulary
    assert r.zipf_slope < 0
