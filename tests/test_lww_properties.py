"""CRDT properties of the LWW merge operator (report.pdf §5.3 asserts these
informally; the reference's correctness depends on them — SURVEY §5)."""

from __future__ import annotations

from nosql_triple_store_spark.catalog import load_table
from nosql_triple_store_spark.functions.lww import latest_by_key, lww_merge

from .conftest import SF_DIR

KEYS = ["user_id", "event_type"]
ORDER = ["ts", "event_id"]
PAYLOAD = ["event_id", "ts", "value"]
COLS = ["user_id", "event_type", "event_id", "ts", "value"]


def _rows(df):
    return sorted(
        (tuple(r[c] for c in COLS) for r in df.select(*COLS).collect()), key=repr
    )


def _splits(spark):
    e = load_table(spark, SF_DIR, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    a = e.filter("event_id % 3 = 0")
    b = e.filter("event_id % 3 = 1")
    c = e.filter("event_id % 3 = 2")
    return e, a, b, c


def test_merge_commutative(spark):
    e, a, b, c = _splits(spark)
    ab = lww_merge(a, [b, c], KEYS, ORDER, PAYLOAD)
    ba = lww_merge(c, [a, b], KEYS, ORDER, PAYLOAD)
    assert _rows(ab) == _rows(ba)


def test_merge_equals_global_latest(spark):
    e, a, b, c = _splits(spark)
    merged = lww_merge(a, [b, c], KEYS, ORDER, PAYLOAD)
    direct = latest_by_key(e, KEYS, ORDER, PAYLOAD)
    assert _rows(merged) == _rows(direct)


def test_merge_idempotent(spark):
    e, a, b, c = _splits(spark)
    once = lww_merge(a, [b, c], KEYS, ORDER, PAYLOAD)
    twice = lww_merge(once.select("event_id", "ts", "user_id", "event_type", "value"),
                      [once.select("event_id", "ts", "user_id", "event_type", "value")],
                      KEYS, ORDER, PAYLOAD)
    assert _rows(once) == _rows(twice)
