"""Tests for the fortieth batch: brute-force band-join differential,
WoW invariants, coverage monotonicity, eccentricity BFS differential."""

from __future__ import annotations

from collections import defaultdict

from nosql_triple_store_spark.catalog import load_table
from nosql_triple_store_spark.operators.graph_ext7 import _digraph
from nosql_triple_store_spark.registry import all_specs

from .conftest import SF_DIR

SPECS = all_specs()


def test_value_band_matches_bruteforce(spark):
    rows = {
        r.event_type: r
        for r in SPECS["q_join_value_band"].fn(spark, SF_DIR).collect()
    }
    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "event_type", "value"
    ).collect()
    by_type = defaultdict(list)
    for r in ev:
        by_type[r.event_type].append((r.event_id, r.value))
    for et, pts in by_type.items():
        pairs = [
            abs(v1 - v2)
            for i, (id1, v1) in enumerate(pts)
            for (id2, v2) in pts[i + 1 :]
            if abs(v1 - v2) <= 0.05
        ]
        if not pairs:
            assert et not in rows
            continue
        assert rows[et].n_pairs == len(pairs)
        assert abs(rows[et].min_gap - min(pairs)) < 1e-6


def test_wow_counts_conserved_and_weeks_are_mondays(spark):
    rows = SPECS["q_events_wow_change"].fn(spark, SF_DIR).collect()
    n_events = load_table(spark, SF_DIR, "events").count()
    assert sum(r.n for r in rows) == n_events
    for r in rows:
        assert r.week_start.weekday() == 0  # Monday
        if r.prev_n is None:
            assert r.wow_ppm is None


def test_vocab_coverage_monotone(spark):
    rows = sorted(
        SPECS["q_text_vocab_coverage"].fn(spark, SF_DIR).collect(),
        key=lambda r: r.k,
    )
    last = 0
    for r in rows:
        assert r.covered_tokens >= last
        assert r.covered_tokens <= r.total_tokens
        assert 0 <= r.coverage_ppm <= 1_000_000
        last = r.covered_tokens


def test_eccentricity_matches_python_bfs(spark):
    rows = {
        r.node: r for r in SPECS["q_graph_eccentricity"].fn(spark, SF_DIR).collect()
    }
    edges = defaultdict(set)
    nodes = set()
    for r in _digraph(spark, SF_DIR).collect():
        edges[r.a].add(r.b)
        nodes.update((r.a, r.b))
    assert set(rows) == nodes
    for src in sorted(nodes)[:15]:
        dist = {src: 0}
        frontier = [src]
        while frontier:
            nxt = []
            for u in frontier:
                for v in edges[u]:
                    if v not in dist:
                        dist[v] = dist[u] + 1
                        nxt.append(v)
            frontier = nxt
        reach = {k: v for k, v in dist.items() if k != src}
        r = rows[src]
        assert r.n_reachable == len(reach)
        assert r.ecc == (max(reach.values()) if reach else None)
