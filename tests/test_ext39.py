"""Tests for the thirty-ninth batch: nearest-asof dominance over
backward-asof, decomposition identity, and walk validity."""

from __future__ import annotations

from nosql_triple_store_spark.operators.graph_ext7 import _digraph
from nosql_triple_store_spark.registry import all_specs

from .conftest import SF_DIR

SPECS = all_specs()


def test_asof_nearest_dominates_backward(spark):
    """The nearest match is never farther than the backward-only match
    for the same event (where the backward join found one)."""
    nearest = {
        r.event_id: r.gap_us
        for r in SPECS["q_join_asof_nearest"].fn(spark, SF_DIR).collect()
    }
    backward = SPECS["q_join_asof"].fn(spark, SF_DIR).collect()
    import datetime

    for r in backward:
        if r.o_orderkey is None or r.event_id not in nearest:
            continue
        ts = r.ts
        od = r.o_orderdate
        if isinstance(od, datetime.date) and not isinstance(
            od, datetime.datetime
        ):
            od = datetime.datetime.combine(od, datetime.time())
        back_gap = abs(int((ts - od).total_seconds() * 1_000_000))
        assert nearest[r.event_id] <= back_gap + 1


def test_seasonal_decompose_identity(spark):
    rows = SPECS["q_events_seasonal_decompose"].fn(spark, SF_DIR).collect()
    days = sorted(r.day for r in rows)
    by_day = {r.day: r for r in rows}
    # edges: first/last 3 days have no full 7-day window
    for d in days[:3] + days[-3:]:
        assert by_day[d].trend is None and by_day[d].residual is None
    for r in rows:
        if r.trend is not None:
            assert abs(r.total - r.trend - r.seasonal - r.residual) <= 0.03


def test_random_walks_follow_edges_and_are_deterministic(spark):
    rows = SPECS["q_graph_random_walk"].fn(spark, SF_DIR).collect()
    edges = {(r.a, r.b) for r in _digraph(spark, SF_DIR).collect()}
    assert rows
    for r in rows:
        hops = r.path.split(">")
        assert len(hops) == 5
        assert hops[0] == r.start and hops[-1] == r.end_node
        for x, y in zip(hops, hops[1:]):
            assert (x, y) in edges or x == y  # dead ends self-absorb
    again = {
        (r.start, r.walk_id): r.path
        for r in SPECS["q_graph_random_walk"].fn(spark, SF_DIR).collect()
    }
    assert {(r.start, r.walk_id): r.path for r in rows} == again
