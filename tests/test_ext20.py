"""Targeted checks for the twentieth extension batch."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from nosql_triple_store_spark.catalog import load_table
from nosql_triple_store_spark.operators.relational_ext20 import (
    q_agg_gini,
    q_events_entropy,
    q_sample_weighted,
)

from .conftest import SF_DIR


def test_entropy_bounds(spark):
    """0 ≤ H ≤ ln(n_types), and H matches a Python recomputation."""
    ev = load_table(spark, SF_DIR, "events")
    cnt = {
        (r.user_id, r.event_type): r.n
        for r in ev.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    by_user: dict = {}
    for (u, t), n in cnt.items():
        by_user.setdefault(u, {})[t] = n
    for r in q_events_entropy(spark, SF_DIR).collect():
        ns = by_user[r.user_id]
        nt = sum(ns.values())
        want = -sum((n / nt) * math.log(n / nt) for n in ns.values())
        assert 0.0 <= r.entropy <= math.log(r.n_types) + 1e-9
        assert abs(r.entropy - want) < 1e-5


def test_gini_in_unit_interval_and_matches_python(spark):
    r = q_agg_gini(spark, SF_DIR).collect()[0]
    assert 0.0 <= r.gini < 1.0
    cents = [
        row.cents
        for row in load_table(spark, SF_DIR, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "cents"
            )
        )
        .collect()
    ]
    cents.sort()
    n = len(cents)
    num = sum((2 * (i + 1) - n - 1) * x for i, x in enumerate(cents))
    want = num / (n * sum(cents))
    assert abs(r.gini - want) < 1e-12


def test_weighted_sample_rate_scales_with_weight(spark):
    """High-price orders must be sampled at a visibly higher rate than
    low-price orders (the point of weighting)."""
    orders = load_table(spark, SF_DIR, "orders")
    med = orders.agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("m")
    ).collect()[0]["m"]
    kept = {r.o_orderkey for r in q_sample_weighted(spark, SF_DIR).collect()}
    rows = orders.select("o_orderkey", "o_totalprice").collect()
    hi = [r for r in rows if r.o_totalprice > med]
    lo = [r for r in rows if r.o_totalprice <= med]
    hi_rate = sum(1 for r in hi if r.o_orderkey in kept) / len(hi)
    lo_rate = sum(1 for r in lo if r.o_orderkey in kept) / len(lo)
    assert hi_rate > lo_rate > 0
