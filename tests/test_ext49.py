"""Tests for the forty-ninth batch: funnel mass conservation, skipgram
symmetry, MERGE clause semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from nosql_triple_store_spark.catalog import load_table
from nosql_triple_store_spark.registry import all_specs

from .conftest import SF_DIR

SPECS = all_specs()


def test_funnel_unordered_mass(spark):
    r = SPECS["q_events_funnel_unordered"].fn(spark, SF_DIR).first()
    n_users = (
        load_table(spark, SF_DIR, "events")
        .filter(F.col("event_type").isin("view", "click", "purchase"))
        .select("user_id")
        .distinct()
        .count()
    )
    assert r.n_complete + r.n_partial == n_users
    if r.n_complete:
        assert 0 <= r.min_spread_us <= r.max_spread_us
        assert r.min_spread_us <= r.avg_spread_us <= r.max_spread_us


def test_skipgrams_symmetric(spark):
    """The +-window is symmetric, so pair counts are symmetric:
    n(center=a, context=b) == n(center=b, context=a)."""
    rows = {
        (r.center, r.context): r.n
        for r in SPECS["q_graph_walk_skipgrams"].fn(spark, SF_DIR).collect()
    }
    assert rows
    for (a, b), n in rows.items():
        assert rows.get((b, a)) == n, (a, b)


def test_merge_upsert_clauses(spark):
    """Deleted keys are gone, changed keys carry the change value,
    target-only keys survive unchanged."""
    ev = load_table(spark, SF_DIR, "events")
    split = F.lit("2024-01-16").cast("date")
    pre_users = {
        r.user_id
        for r in ev.filter(F.col("ts").cast("date") < split)
        .select("user_id")
        .distinct()
        .collect()
    }
    post = (
        ev.filter(F.col("ts").cast("date") >= split)
        .groupBy("user_id")
        .agg(
            F.max_by("event_type", F.struct("ts", "event_id")).alias("st")
        )
        .collect()
    )
    post_status = {r.user_id: r.st for r in post}
    out = {
        r.user_id: r.status
        for r in SPECS["q_maintenance_merge_upsert"].fn(spark, SF_DIR).collect()
    }
    for u, st in post_status.items():
        if st == "error":
            assert u not in out  # DELETE clause
        else:
            assert out[u] == st  # UPDATE / INSERT clause
    for u in pre_users - set(post_status):
        assert u in out  # untouched target rows survive
