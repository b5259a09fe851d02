"""Tests for the forty-fourth batch: spatial-join brute-force
differential and log2 bucket arithmetic."""

from __future__ import annotations

from nosql_triple_store_spark.catalog import load_table
from nosql_triple_store_spark.registry import all_specs

from .conftest import SF_DIR

SPECS = all_specs()

_A = 2654435761
_M = 4294967296


def _h(k):
    return ((k % 2147483648) * _A + 12345) % _M


def test_spatial_grid_matches_bruteforce(spark):
    rows = {
        (r.u1, r.u2) for r in SPECS["q_join_spatial_grid"].fn(spark, SF_DIR).collect()
    }
    users = [
        r.u
        for r in load_table(spark, SF_DIR, "customer")
        .selectExpr("c_custkey AS u")
        .distinct()
        .collect()
    ]
    import math

    side = max(10, math.ceil(math.sqrt(len(users) / 150.0)))
    mod = 100 * side
    pts = {
        u: (
            _h(u) % 999983 % mod / 100.0,
            _h(u * 2 + 1) % 999979 % mod / 100.0,
        )
        for u in users
    }
    expected = set()
    for i, u1 in enumerate(users):
        for u2 in users[i + 1 :]:
            a, b = pts[u1], pts[u2]
            d2 = (a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2
            if d2 <= 0.25 * 0.25:
                expected.add((min(u1, u2), max(u1, u2)))
    assert rows == expected
    assert len(rows) > 0


def test_log2_histogram_buckets(spark):
    rows = SPECS["q_agg_log2_histogram"].fn(spark, SF_DIR).collect()
    n_orders = load_table(spark, SF_DIR, "orders").count()
    assert sum(r.n for r in rows) == n_orders
    for r in rows:
        assert r.lo_cents == 1 << (r.bucket - 1)
        assert r.hi_cents == (1 << r.bucket) - 1
        assert r.lo_cents <= r.hi_cents
