"""Targeted checks for the twenty-second extension batch."""

from __future__ import annotations

import pyspark.sql.functions as F

from nosql_triple_store_spark.catalog import load_table
from nosql_triple_store_spark.operators.relational_ext22 import (
    _SESSION_US,
    q_events_peak_concurrency,
    q_orders_open_balance,
)

from .conftest import SF_DIR


def test_open_balance_reconciles(spark):
    """The final running balance must equal total non-'F' orders, and
    the balance is the prefix sum of its own deltas."""
    rows = sorted(
        q_orders_open_balance(spark, SF_DIR).collect(), key=lambda r: r.month
    )
    running = 0
    for r in rows:
        running += r.opened - r.closed
        assert r.open_balance == running
    orders = load_table(spark, SF_DIR, "orders")
    not_finished = orders.filter(F.col("o_orderstatus") != "F").count()
    assert rows[-1].open_balance == not_finished


def test_peak_concurrency_bounds_and_witness(spark):
    """1 ≤ peak ≤ |events|, and the witness instant really has `peak`
    concurrently open intervals."""
    r = q_events_peak_concurrency(spark, SF_DIR).collect()[0]
    ev = load_table(spark, SF_DIR, "events")
    n = ev.count()
    assert 1 <= r.peak_concurrency <= n
    t = F.unix_micros(F.col("ts").cast("timestamp"))
    open_at = ev.filter(
        (t <= r.peak_at_us) & (t + _SESSION_US > r.peak_at_us)
    ).count()
    assert open_at == r.peak_concurrency
