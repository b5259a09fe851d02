"""Count-min sketch invariants against the exact aggregate: CMS never
undercounts, and overshoot is bounded by the sketch dimensions."""

from __future__ import annotations

from pyspark.sql import functions as F

from nosql_triple_store_spark.catalog import load_table
from nosql_triple_store_spark.operators.relational_ext8 import (
    CMS_WIDTH,
    q_agg_countmin,
)

from .conftest import SF_DIR


def test_countmin_error_bounds(spark):
    est = q_agg_countmin(spark, SF_DIR)
    exact = (
        load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("true_n"))
    )
    n_total = load_table(spark, SF_DIR, "events").count()
    j = est.join(exact, "user_id").collect()
    assert j, "no keys probed"
    for r in j:
        # CMS can only overcount (hash collisions add, never subtract)
        assert r.est_n >= r.true_n, (r.user_id, r.est_n, r.true_n)
        # standard bound: overshoot <= e * N / w per row with high prob;
        # use the loose deterministic-ish 4x slack to stay flake-free
        assert r.est_n - r.true_n <= 4 * 2.72 * n_total / CMS_WIDTH, (
            r.user_id,
            r.est_n,
            r.true_n,
        )


def test_countmin_deterministic(spark):
    a = {(r.user_id, r.est_n) for r in q_agg_countmin(spark, SF_DIR).collect()}
    b = {(r.user_id, r.est_n) for r in q_agg_countmin(spark, SF_DIR).collect()}
    assert a == b
