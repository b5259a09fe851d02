"""Tests for the forty-first batch: quota-sample shape and txn-log
replay semantics (remove actually removes)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from nosql_triple_store_spark.catalog import load_table
from nosql_triple_store_spark.operators.relational_ext41 import (
    _TXN_SLICES,
    _txnlog_table,
)
from nosql_triple_store_spark.registry import all_specs

from .conftest import SF_DIR

SPECS = all_specs()


def test_group_quota_exact_k_per_stratum(spark):
    rows = SPECS["q_sample_group_quota"].fn(spark, SF_DIR).collect()
    per_type = Counter(r.event_type for r in rows)
    types = {
        r.event_type
        for r in load_table(spark, SF_DIR, "events")
        .select("event_type")
        .distinct()
        .collect()
    }
    assert set(per_type) == types
    for et, n in per_type.items():
        assert n == 5, (et, n)
    for r in rows:
        assert 1 <= r.rank <= 5
    again = {
        (r.event_type, r.rank): r.event_id
        for r in SPECS["q_sample_group_quota"].fn(spark, SF_DIR).collect()
    }
    assert {(r.event_type, r.rank): r.event_id for r in rows} == again


def test_txnlog_removed_file_not_visible(spark):
    """The snapshot must exclude exactly the doc_id % 4 == 1 slice
    (file f1, added in v0 and removed in v1)."""
    import os

    root = _txnlog_table(spark, SF_DIR)
    snap = spark.read.parquet(
        *[os.path.join(root, f) for f in ("f0", "f2", "f3")]
    )
    mods = {
        r.m
        for r in snap.select(
            (F.col("doc_id") % _TXN_SLICES).alias("m")
        )
        .distinct()
        .collect()
    }
    assert mods == {0, 2, 3}
    total = SPECS["q_source_txnlog_snapshot"].fn(spark, SF_DIR).agg(
        F.sum("n_docs")
    ).first()[0]
    expected = (
        load_table(spark, SF_DIR, "documents")
        .filter(F.col("doc_id") % _TXN_SLICES != 1)
        .count()
    )
    assert total == expected
