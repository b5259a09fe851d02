"""Tests for the thirty-sixth batch: KMV sketch error bounds, M4
envelope invariants, k-anonymity mass conservation, dyad census
consistency, and a pure-Python VAD differential."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from nosql_triple_store_spark.catalog import load_table
from nosql_triple_store_spark.registry import all_specs

from .conftest import SF_DIR

SPECS = all_specs()


def test_kmv_theta_error_bound(spark):
    """KMV distinct estimates land within the sketch's accuracy
    envelope of the true cardinalities (relative standard error
    ~1/sqrt(k-2); we allow 3x), and collapse to EXACT counts whenever
    the population fits inside the sketch."""
    r = SPECS["q_agg_kmv_theta"].fn(spark, SF_DIR).first()
    ev = load_table(spark, SF_DIR, "events")

    def exact(et):
        return (
            ev.filter(F.col("event_type") == et)
            .select("user_id")
            .distinct()
            .count()
        )

    n_click, n_buy = exact("click"), exact("purchase")
    tol = 3.0 / np.sqrt(r.k - 2)
    for est, true, cnt in ((r.est_a, n_click, r.cnt_a), (r.est_b, n_buy, r.cnt_b)):
        if cnt < r.k:
            assert est == true  # sub-k population => sketch is exact
        else:
            assert abs(est - true) <= tol * true, (est, true)
    assert 0 <= r.est_inter <= min(r.est_a, r.est_b) * (1 + tol) + r.k
    assert r.est_union <= r.est_a + r.est_b


def test_m4_envelope_invariants(spark):
    """M4 buckets conserve the row count and the first/last values sit
    inside the [min, max] envelope with coherent timestamps."""
    rows = SPECS["q_events_m4_downsample"].fn(spark, SF_DIR).collect()
    n_events = load_table(spark, SF_DIR, "events").count()
    assert sum(r.n for r in rows) == n_events
    for r in rows:
        assert r.v_min <= r.v_first <= r.v_max
        assert r.v_min <= r.v_last <= r.v_max
        assert r.t_first_us <= r.t_last_us
        assert r.t_first_us // 86_400_000_000 == r.bucket


def test_kanon_mass_conservation(spark):
    """Per segment, suppressed + safe rows == the segment's customer
    count (no row is dropped or double-counted by the census)."""
    rows = SPECS["q_privacy_kanon"].fn(spark, SF_DIR).collect()
    cust = (
        load_table(spark, SF_DIR, "customer")
        .groupBy("c_mktsegment")
        .count()
        .collect()
    )
    per_seg = {r.c_mktsegment: r["count"] for r in cust}
    for r in rows:
        assert r.suppressed_rows + r.safe_rows == per_seg[r.segment]
        assert r.small_groups <= r.n_groups
        assert r.min_group_size >= 1


def test_reciprocity_census_consistency(spark):
    """Dyad counts account for every non-loop directed edge and the
    reciprocity ratio is the exact ppm of the mutual share."""
    r = SPECS["q_graph_reciprocity"].fn(spark, SF_DIR).first()
    total_dirs = 2 * r.mutual_dyads + r.asym_dyads
    assert total_dirs >= 1
    assert r.recip_ppm == (2 * r.mutual_dyads * 1_000_000) // total_dirs
    assert 0 <= r.recip_ppm <= 1_000_000


def test_vad_python_differential(spark):
    """The distributed VAD matches an independent pure-Python
    re-derivation of frame flags + run-length merge for every doc."""
    rows = {
        r.doc_id: r
        for r in SPECS["q_multimodal_audio_vad"].fn(spark, SF_DIR).collect()
    }
    for doc_id, r in sorted(rows.items())[:50]:
        nf = 12 + doc_id % 9
        flags = [((doc_id * 13 + f * 7) % 5) < 2 for f in range(nf)]
        runs, cur = [], 0
        for v in flags:
            if v:
                cur += 1
            elif cur:
                runs.append(cur)
                cur = 0
        if cur:
            runs.append(cur)
        assert r.n_frames == nf
        assert r.n_voiced == sum(runs)
        assert r.n_segments == len(runs)
        assert r.longest_run_frames == (max(runs) if runs else 0)
        assert r.voiced_ms == 10 * sum(runs)
