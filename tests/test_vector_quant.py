"""Quantization reconstruction-error bound: decoding code*scale/127 must
land within half a quantization step of the original component (no
component exceeds the clamp range in the fixture, probed |x| < 0.58)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from nosql_triple_store_spark.catalog import load_table
from nosql_triple_store_spark.operators.vector_ext3 import _LEVELS, _SCALE

from .conftest import SF_DIR


def test_quantization_reconstruction_error(spark):
    emb = load_table(spark, SF_DIR, "embeddings").select("embedding").collect()
    mat = np.vstack([r.embedding for r in emb]).astype(np.float64)
    codes = np.round(np.clip(mat, -_SCALE, _SCALE) * _LEVELS / _SCALE)
    recon = codes * _SCALE / _LEVELS
    err = np.abs(recon - mat).max()
    assert err <= _SCALE / (2 * _LEVELS) + 1e-12, err


def test_quantize_query_matches_numpy(spark):
    from nosql_triple_store_spark.operators.vector_ext3 import q_vector_quantize

    rows = q_vector_quantize(spark, SF_DIR).collect()
    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in load_table(spark, SF_DIR, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    }
    for r in rows[:50]:
        codes = np.round(
            np.clip(emb[r.vec_id], -_SCALE, _SCALE) * _LEVELS / _SCALE
        ).astype(np.int64)
        assert r.dim == len(codes)
        assert r.l1_code == int(np.abs(codes).sum()), r.vec_id
        assert r.max_code == int(codes.max()) and r.min_code == int(codes.min())
