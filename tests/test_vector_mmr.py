"""q_vector_mmr: greedy-selection invariants + independent re-derivation
of the MMR picks from raw embeddings (differential check in lieu of a
SQL oracle — the recursion is not SQL-expressible)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from nosql_triple_store_spark.catalog import load_table
from nosql_triple_store_spark.functions.vectors import (
    as_double_array,
    cosine_col,
)
from nosql_triple_store_spark.operators.vector_ext5 import (
    MMR_K,
    MMR_LAMBDA,
    MMR_POOL,
    q_vector_mmr,
)

from .conftest import SF_DIR


def _pool(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    probe = emb.filter(F.col("vec_id") == 0).select(
        as_double_array("embedding").alias("pe")
    )
    return (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(probe))
        .select(
            "vec_id",
            as_double_array("embedding").alias("v"),
            cosine_col(as_double_array("embedding"), F.col("pe")).alias("rel"),
        )
        .orderBy(F.desc("rel"), F.asc("vec_id"))
        .limit(MMR_POOL)
        .collect()
    )


def test_mmr_matches_independent_greedy(spark):
    got = q_vector_mmr(spark, SF_DIR).orderBy("rank").collect()
    pool = _pool(spark)
    ids = np.array([r["vec_id"] for r in pool])
    rel = np.array([r["rel"] for r in pool])
    mat = np.array([r["v"] for r in pool], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mat @ mat.T
    selected, remaining = [], list(range(len(ids)))
    want = []
    for _ in range(MMR_K):
        if selected:
            scores = {
                j: MMR_LAMBDA * rel[j]
                - (1 - MMR_LAMBDA) * max(sims[j][s] for s in selected)
                for j in remaining
            }
        else:
            scores = {j: MMR_LAMBDA * rel[j] for j in remaining}
        best = min(remaining, key=lambda j: (-scores[j], ids[j]))
        want.append(int(ids[best]))
        selected.append(best)
        remaining.remove(best)
    assert [r["vec_id"] for r in got] == want
    # pick 1 is the plain relevance top-1
    assert got[0]["vec_id"] == int(ids[np.lexsort((ids, -rel))[0]])
    # ranks are 1..k, picks distinct, all from the pool
    assert [r["rank"] for r in got] == list(range(1, MMR_K + 1))
    assert len({r["vec_id"] for r in got}) == MMR_K
    assert {r["vec_id"] for r in got} <= set(ids.tolist())


def test_mmr_reduces_redundancy_vs_topk(spark):
    pool = _pool(spark)
    ids = [r["vec_id"] for r in pool]
    mat = np.array([r["v"] for r in pool], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mat @ mat.T
    got = [r["vec_id"] for r in q_vector_mmr(spark, SF_DIR).collect()]
    idx = {v: i for i, v in enumerate(ids)}

    def mean_pairwise(vids):
        ii = [idx[v] for v in vids]
        vals = [sims[a][b] for k, a in enumerate(ii) for b in ii[k + 1:]]
        return float(np.mean(vals))

    topk = ids[:MMR_K]  # pool is relevance-sorted
    assert mean_pairwise(got) <= mean_pairwise(topk) + 1e-12
