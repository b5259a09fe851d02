"""Batch-29 semantic evidence: EWMA closed form vs the sequential
recurrence, moment sanity, vacuum retention invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from nosql_triple_store_spark.registry import all_specs

from .conftest import SF_DIR

SPECS = all_specs()


def test_ewma_closed_form_equals_recurrence(spark):
    """The weighted-sum formulation must equal the textbook recurrence
    e_t = a*x_t + (1-a)*e_{t-1} evaluated sequentially in Python."""
    ev = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("user_id", "event_id", "ts", "value")
        .collect()
    )
    series: dict[int, list[tuple]] = {}
    for r in ev:
        series.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], r["value"])
        )
    expected = {}
    for uid, rows in series.items():
        rows.sort()
        e = rows[0][2]
        for _, _, x in rows[1:]:
            e = 0.3 * x + 0.7 * e
        expected[uid] = round(e, 6)

    got = {
        r["user_id"]: r["ewma"]
        for r in SPECS["q_window_ewma"].fn(spark, SF_DIR).collect()
    }
    assert set(got) == set(expected)
    for uid in got:
        assert abs(got[uid] - expected[uid]) < 1e-5, uid


def test_moments_match_known_distribution(spark):
    """Sanity on real data: stddev>0; skew/kurtosis finite; and the
    two-pass result agrees with numpy on one group."""
    import numpy as np
    import pyarrow.parquet as pq

    rows = SPECS["q_agg_moments"].fn(spark, SF_DIR).collect()
    assert all(r["stddev_pop"] > 0 for r in rows)
    t = pq.read_table(f"{SF_DIR}/events.parquet").to_pandas()
    g = t[t["event_type"] == rows[0]["event_type"]]["value"].to_numpy()
    mu = g.mean()
    m2 = ((g - mu) ** 2).mean()
    m3 = ((g - mu) ** 3).mean()
    m4 = ((g - mu) ** 4).mean()
    assert abs(rows[0]["skewness"] - m3 / m2**1.5) < 1e-6
    assert abs(rows[0]["excess_kurtosis"] - (m4 / m2**2 - 3)) < 1e-6


def test_vacuum_keeps_latest_and_preserves_reads(spark):
    rows = SPECS["q_maintenance_vacuum"].fn(spark, SF_DIR).collect()
    dispo = {r["version"]: r["disposition"] for r in rows}
    versions = sorted(dispo)
    # newest K kept, oldest removed, and the live read-back is non-empty
    assert dispo[versions[-1]] == "kept"
    assert dispo[versions[0]] == "removed"
    assert sum(1 for d in dispo.values() if d == "kept") == 2
    assert all(r["live_rows"] > 0 for r in rows)
    # idempotent: a second invocation reports the same original run
    again = SPECS["q_maintenance_vacuum"].fn(spark, SF_DIR).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))
