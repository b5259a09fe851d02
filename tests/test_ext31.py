"""Batch-31 semantic evidence beyond the oracles: profiler self-
consistency, incremental-view equivalence to one-shot aggregation, and
resample-kernel arithmetic."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from nosql_triple_store_spark.registry import all_specs

from .conftest import SF_DIR

SPECS = all_specs()


def test_profile_internal_consistency(spark):
    """n_nulls <= n_rows; n_distinct <= n_rows - n_nulls (nulls are not
    distinct values); min_s <= max_s lexically for string-cast stats of
    a non-null column."""
    rows = SPECS["q_profile_table"].fn(spark, SF_DIR).collect()
    assert len(rows) == 6
    for r in rows:
        assert 0 <= r["n_nulls"] <= r["n_rows"]
        assert r["n_distinct"] <= r["n_rows"] - r["n_nulls"]
        if r["n_nulls"] < r["n_rows"]:
            assert r["min_s"] is not None and r["max_s"] is not None


def test_incr_view_equals_batch_census(spark):
    """The incrementally maintained view must equal a one-shot batch
    aggregate over the same source — fold order cannot matter because
    the partial aggregates are associative integer sums."""
    got = {
        r["event_type"]: (r["n_events"], r["cents"])
        for r in SPECS["q_stream_incr_view"].fn(spark, SF_DIR).collect()
    }
    want = {
        r["event_type"]: (r["n"], r["cents"])
        for r in spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        )
        .collect()
    }
    assert got == want


def test_resample_halves_duration_and_preserves_even_samples():
    """Pure-kernel check: 2:1 decimation of an encoded+decoded WAV keeps
    exactly the even-index samples and halves the nominal rate."""
    from nosql_triple_store_spark.operators.multimodal import (
        decode_wav_pcm16,
        encode_wav_pcm16,
    )

    sig = np.arange(-50, 51, dtype=np.int64) * 7
    _, dec = decode_wav_pcm16(encode_wav_pcm16(sig, 8000))
    rate2, dec2 = decode_wav_pcm16(
        encode_wav_pcm16(dec[::2].astype(np.int64), 4000)
    )
    assert rate2 == 4000
    np.testing.assert_array_equal(dec2, sig[::2].astype(np.int16))
