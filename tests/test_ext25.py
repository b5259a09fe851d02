"""Targeted checks for the shard manifest."""

from __future__ import annotations

from nosql_triple_store_spark.catalog import load_table
from nosql_triple_store_spark.operators.relational_ext25 import (
    _N_SHARDS,
    q_multimodal_shard_manifest,
)

from .conftest import SF_DIR


def test_manifest_covers_corpus_and_balances(spark):
    rows = q_multimodal_shard_manifest(spark, SF_DIR).collect()
    assert {r.shard for r in rows} == set(range(_N_SHARDS))
    total_docs = load_table(spark, SF_DIR, "documents").count()
    assert sum(r.n_docs for r in rows) == total_docs
    # hash sharding balances byte volume: max shard within 2x of min
    # (500 docs / 8 shards is small-sample; at sf0.1 the spread tightens)
    sizes = [r.total_bytes for r in rows]
    assert max(sizes) < 2 * min(sizes), sizes


def test_manifest_assignment_stable(spark):
    a = {(r.shard, r.n_docs, r.total_bytes)
         for r in q_multimodal_shard_manifest(spark, SF_DIR).collect()}
    b = {(r.shard, r.n_docs, r.total_bytes)
         for r in q_multimodal_shard_manifest(spark, SF_DIR).collect()}
    assert a == b
