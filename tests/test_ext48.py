"""Tests for the forty-eighth batch: cogrouped merge_asof equals the
aggregate-based as-of join row for row."""

from __future__ import annotations

from nosql_triple_store_spark.registry import all_specs

from .conftest import SF_DIR

SPECS = all_specs()


def test_cogroup_asof_equals_aggregate_asof(spark):
    """Two implementations, one semantics: the cogrouped pandas
    merge_asof must reproduce q_join_asof's (event -> order) assignment
    exactly, including null matches and same-date tie-breaks."""
    a = {
        r.event_id: (r.o_orderkey, r.o_orderdate)
        for r in SPECS["q_join_asof"].fn(spark, SF_DIR).collect()
    }
    b = {
        r.event_id: (r.o_orderkey, r.o_orderdate)
        for r in SPECS["q_join_asof_cogroup"].fn(spark, SF_DIR).collect()
    }
    assert set(a) == set(b)
    diff = {k: (a[k], b[k]) for k in a if a[k] != b[k]}
    assert not diff, list(diff.items())[:5]
