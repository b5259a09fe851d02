"""Vector batch 5: Maximal Marginal Relevance (MMR) diversity selection
— the re-ranking step retrieval/RAG pipelines run after top-k so the
selected set is not k near-copies of the same passage (Carbonell &
Goldstein 1998): greedily pick argmax of
λ·sim(query, d) − (1−λ)·max_{s∈selected} sim(d, s).

Two-phase distributed shape: the RELEVANCE phase is the exact
distributed scorer (codegen'd cosine over every vector + TakeOrdered
top-C) — that is the part that scales with corpus size; the SELECTION
phase is inherently sequential (each pick depends on the previous) but
runs over the bounded C-row candidate set, so it executes as numpy
inside ONE Arrow task via mapInPandas — no vector ever reaches the
driver. At 100 TB only C changes the selection cost, never corpus size."""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.vectors import as_double_array, cosine_col
from ..registry import register

MMR_K = 10
MMR_POOL = 50
MMR_LAMBDA = 0.7


def _mmr_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Greedy MMR over one Arrow batch of (vec_id, rel, embedding).
    Normalizes once; pairwise sims via one GEMM; ties break by vec_id
    (candidates arrive relevance-sorted but selection re-ranks)."""
    for pdf in batches:
        if pdf.empty:
            continue
        ids = pdf["vec_id"].to_numpy()
        rel = pdf["rel"].to_numpy()
        mat = np.array(list(pdf["embedding"]), dtype=np.float64)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        n = len(ids)
        sims = mat @ mat.T  # C×C — bounded by the pool size
        selected: list[int] = []
        remaining = list(range(n))
        rows = []
        for rank in range(1, min(MMR_K, n) + 1):
            if not selected:
                scores = {j: MMR_LAMBDA * rel[j] for j in remaining}
            else:
                scores = {
                    j: MMR_LAMBDA * rel[j]
                    - (1.0 - MMR_LAMBDA) * max(sims[j][s] for s in selected)
                    for j in remaining
                }
            # argmax with deterministic vec_id tiebreak
            best = min(remaining, key=lambda j: (-scores[j], ids[j]))
            rows.append(
                {
                    "rank": rank,
                    "vec_id": int(ids[best]),
                    "relevance": round(float(rel[best]), 6),
                    "mmr_score": round(float(scores[best]), 6),
                }
            )
            selected.append(best)
            remaining.remove(best)
        yield pd.DataFrame(rows)


@register("q_vector_mmr", oracle=None)  # rows-only: iterative re-ranking
def q_vector_mmr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR top-10 from a top-50 relevance pool for the vec_id=0 probe
    (module docstring). Deterministic (exact cosine, fixed λ, vec_id
    tiebreaks) but not SQL-expressible (k-step greedy recursion over an
    evolving max) ⇒ rows-only; tests/test_vector_mmr.py re-runs the
    greedy selection independently from collected rows and asserts the
    invariants (pick 1 = relevance top-1, selected ⊆ pool, pairwise-sim
    reduction vs plain top-k)."""
    emb = load_table(spark, sf_dir, "embeddings")
    probe = emb.filter(F.col("vec_id") == 0).select(
        as_double_array("embedding").alias("pe")
    )
    pool = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(probe))
        .select(
            "vec_id",
            "embedding",
            cosine_col(as_double_array("embedding"), F.col("pe")).alias(
                "rel"
            ),
        )
        .orderBy(F.desc("rel"), F.asc("vec_id"))
        .limit(MMR_POOL)
    )
    return pool.coalesce(1).mapInPandas(
        _mmr_kernel,
        schema="rank long, vec_id long, relevance double, mmr_score double",
    )
