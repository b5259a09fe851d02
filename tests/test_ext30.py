"""Tombstone-LWW properties: deletes must merge like writes (order
independent) and must never be resurrected by older concurrent updates."""

from __future__ import annotations

from pyspark.sql import functions as F

from nosql_triple_store_spark.functions.lww import latest_by_key
from nosql_triple_store_spark.registry import all_specs

from .conftest import SF_DIR

SPECS = all_specs()

_SCHEMA = "k int, ts int, eid int, value double, deleted boolean"


def _state(spark, rows):
    df = spark.createDataFrame(rows, _SCHEMA)
    latest = latest_by_key(
        df, keys=["k"], order=["ts", "eid"], payload=["ts", "eid", "value", "deleted"]
    )
    return {
        r["k"]: (r["ts"], r["eid"], r["value"], r["deleted"])
        for r in latest.collect()
    }


def test_tombstone_beats_older_update_any_order(spark):
    """A tombstone at t=20 must suppress an update at t=10 regardless of
    merge arrival order — drop-before-merge would resurrect the key."""
    upd = (1, 10, 1, 5.0, False)
    tomb = (1, 20, 2, None, True)
    assert _state(spark, [upd, tomb]) == _state(spark, [tomb, upd])
    st = _state(spark, [upd, tomb])
    assert st[1][3] is True  # deleted wins


def test_newer_update_beats_tombstone(spark):
    """Writes after the delete re-create the key (standard LWW-register
    semantics; no delete-wins bias)."""
    st = _state(
        spark,
        [(1, 10, 1, 5.0, False), (1, 20, 2, None, True), (1, 30, 3, 7.0, False)],
    )
    assert st[1][3] is False and st[1][1] == 3 and st[1][2] == 7.0


def test_tombstone_query_hides_exactly_deleted_keys(spark):
    """Register keys whose newest write is a tombstone must be absent
    from q_lww_tombstone but present in q_lww_latest."""
    latest = {
        (r["user_id"], r["event_type"])
        for r in SPECS["q_lww_latest"].fn(spark, SF_DIR).collect()
    }
    with_tomb = {
        (r["user_id"], r["event_type"])
        for r in SPECS["q_lww_tombstone"].fn(spark, SF_DIR).collect()
    }
    assert with_tomb <= latest
    assert len(with_tomb) < len(latest)  # some keys really got deleted
