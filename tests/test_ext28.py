"""Semantic evidence for the batch-28 rows-only operators, plus packing
invariants for the oracle-checked ones."""

from __future__ import annotations

import zlib

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from nosql_triple_store_spark.registry import all_specs

from .conftest import SF_DIR

SPECS = all_specs()


def test_pack_sequences_conserves_tokens(spark):
    """Packing is a partition of the corpus: per-source token totals and
    doc counts must equal the unpacked census, and every sequence except
    possibly a source's last must have n_tokens spanning its budget
    boundary (n_tokens >= 1)."""
    packed = SPECS["q_pack_sequences"].fn(spark, SF_DIR)
    per_source = (
        packed.groupBy("source")
        .agg(
            F.sum("n_docs").alias("docs"),
            F.sum("n_tokens").alias("tokens"),
        )
        .collect()
    )
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    census = {
        r["source"]: (r["docs"], r["tokens"])
        for r in docs.select(
            "source",
            F.size(
                F.filter(F.split(F.lower("text"), " "), lambda t: t != "")
            ).alias("n_tok"),
        )
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("docs"), F.sum("n_tok").alias("tokens"))
        .collect()
    }
    assert {r["source"]: (r["docs"], r["tokens"]) for r in per_source} == census


def test_mixture_weights_rebalance_toward_uniform(spark):
    """Weights are in (0, 1]; an over-represented source is down-sampled
    and after weighting no source exceeds the uniform target share."""
    rows = SPECS["q_mixture_weights"].fn(spark, SF_DIR).collect()
    n = len(rows)
    assert all(0 < r["sample_weight"] <= 1.0 for r in rows)
    sampled_total = sum(r["sampled_tokens_est"] for r in rows)
    for r in rows:
        # post-sampling share may not exceed the uniform target (up to
        # rounding of the estimate)
        assert r["sampled_tokens_est"] <= r["tokens"]
        assert (
            r["sampled_tokens_est"] / sampled_total
            <= 1.0 / n + 0.01
        )


def test_label_propagation_deterministic_and_consistent(spark):
    r1 = sorted(
        map(tuple, SPECS["q_graph_label_propagation"].fn(spark, SF_DIR).collect())
    )
    r2 = sorted(
        map(tuple, SPECS["q_graph_label_propagation"].fn(spark, SF_DIR).collect())
    )
    assert r1 == r2
    total = sum(size for _, size in r1)
    # community sizes partition the node set of the undirected graph
    from nosql_triple_store_spark.operators.graph import _edges

    e = _edges(spark, SF_DIR)
    nodes = (
        e.select(F.col("src").alias("n"))
        .unionByName(e.select(F.col("dst").alias("n")))
        .distinct()
        .count()
    )
    assert total == nodes
    assert len(r1) < total  # propagation actually merged labels


def test_compressibility_matches_python_zlib(spark):
    rows = (
        SPECS["q_text_compressibility"].fn(spark, SF_DIR).limit(50).collect()
    )
    texts = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    for r in rows:
        expected = len(zlib.compress(texts[r["doc_id"]].encode("utf-8"), 6))
        assert r["zlib_bytes"] == expected
        assert 0 < r["ratio"]


def test_compressibility_flags_repetition(spark):
    """A highly repetitive string must compress far better than unique
    text — the signal the filter exists for."""
    import pandas as pd

    rep = "the same line again and again " * 50
    uniq = " ".join(f"tok{i}x{i*7%101}" for i in range(300))
    assert len(zlib.compress(rep.encode())) / len(rep.encode()) < 0.1
    assert len(zlib.compress(uniq.encode())) / len(uniq.encode()) > 0.25
