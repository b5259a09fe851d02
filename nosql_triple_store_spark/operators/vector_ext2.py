"""Random-hyperplane (SRP) LSH for embedding near-dup — the sub-quadratic
scale path for q_dedup_embed's exact blocked GEMM (Charikar'02 sign-random-
projection: P[per-plane collision] = 1 - angle/pi).

Parameter choice is an explicit recall/cost tradeoff, and the fixture is
the HARD case: its vectors are near-orthogonal (max pairwise cosine
~0.51), so the tau=0.4 threshold sits at ~66 degrees where the per-plane
collision prob is only 0.63. 5 bands x 6 bits gives expected recall
1-(1-0.63^6)^5 ~ 0.28 at tau exactly (higher above it) with candidate
volume ~bands x buckets x (n/buckets)^2 /2 — the knob a production
near-dup pipeline turns toward MORE bands of MORE bits because real
duplicate pairs sit at cosine 0.9+ (angle < 26 deg, per-plane p = 0.86,
6-bit band p = 0.4) where recall saturates cheaply. The recall floor and
the subset-of-exact invariant are asserted in tests/test_vector_lsh.py.

Pipeline: sign signature per vector (one vectorized numpy matmul in a
pandas UDF; 5 bands x adaptive band width — 6 bits / 30 planes at the
fixture sizes, widening with log2(n) so buckets never saturate), banded
self-join for candidates (codegen'd), vectorized exact cosine verify on
the candidate set only.
At 100 TB the candidate join replaces the n² GEMM with
sum-per-bucket(k²) — the same inverted-index shape as MinHash LSH, with
the verify GEMM confined to bucket-sized blocks."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType

from ..catalog import load_table
from ..registry import register
from ..materialize import materialize

_N_BANDS = 5
_BAND_BITS_MIN = 6  # the historical 30-plane signature (n <= 2048)
_BAND_BITS_MAX = 12  # 5 x 12 = 60 planes still fit one int64 signature
_TARGET_BUCKET = 32  # band bits sized so n / 2^bits stays ~bounded
_DIM = 64
_TAU = 0.4


def _band_bits(n: int) -> int:
    """Adaptive band width: FIXED 6-bit bands have only 64 bucket
    values, so buckets saturate as the corpus grows and the candidate
    join turns quadratic (the r7 sf1 sweep measured 51 s at 20k
    vectors). Widen bands with log2(n) so expected bucket load stays
    ~_TARGET_BUCKET; n <= 2048 keeps the historical 6 bits (and with
    the fixed seed, the historical planes) bit-identically."""
    bits = _BAND_BITS_MIN
    while bits < _BAND_BITS_MAX and n / (1 << bits) > _TARGET_BUCKET:
        bits += 1
    return bits


def _planes(n_planes: int) -> np.ndarray:
    # deterministic hyperplanes; seed fixed so signatures are stable
    # across runs, executors and sessions
    rng = np.random.default_rng(42)
    return rng.standard_normal((_DIM, n_planes))


def _srp_sig_udf(n_planes: int):
    @F.pandas_udf(LongType())
    def _srp_sig(emb: pd.Series) -> pd.Series:
        r = _planes(n_planes)
        mat = np.vstack(emb.to_numpy())  # (batch, dim)
        bits = (mat @ r) > 0  # (batch, planes)
        weights = (1 << np.arange(n_planes, dtype=np.int64))
        return pd.Series((bits @ weights).astype(np.int64))

    return _srp_sig


@F.pandas_udf(DoubleType())
def _cos_pair(va: pd.Series, vb: pd.Series) -> pd.Series:
    a = np.vstack(va.to_numpy()).astype(np.float64)
    b = np.vstack(vb.to_numpy()).astype(np.float64)
    num = np.einsum("ij,ij->i", a, b)
    den = np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
    return pd.Series(num / den)


@register("q_dedup_lsh_cosine", oracle=None)  # rows-only: LSH candidate set
def q_dedup_lsh_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRP-LSH candidate pairs passing the exact cosine threshold
    (>= 0.4): a deterministic SUBSET of q_dedup_embed's exact result
    (missed pairs = banding false negatives; measured recall asserted in
    tests/test_vector_lsh.py). Candidates whose signatures share any
    6-bit band are verified with exact cosine — the verify runs only on
    the candidate set, which is what makes the whole thing
    sub-quadratic."""
    emb = load_table(spark, sf_dir, "embeddings")
    band_bits = _band_bits(emb.count())  # bounded layout scalar
    sigs = emb.select(
        "vec_id",
        "embedding",
        _srp_sig_udf(_N_BANDS * band_bits)("embedding").alias("sig"),
    )
    bands = sigs.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.expr(
                            f"(sig >> {band_bits * i}) & {(1 << band_bits) - 1}"
                        ).alias("band_val"),
                    )
                    for i in range(_N_BANDS)
                ]
            )
        ).alias("b"),
    ).select("vec_id", "b.band_idx", "b.band_val").transform(materialize)
    # ^ checkpoint: both self-join sides consume the banded signatures,
    # and the SRP-signature UDF would otherwise run over the corpus
    # twice. Repartition on the join key BEFORE aliasing so the two
    # exchange subtrees are identical and the shuffle is reused.
    bp = bands.repartition("band_idx", "band_val")
    lhs = bp.select(
        F.col("vec_id").alias("vec_a"), "band_idx", "band_val"
    )
    rhs = bp.select(
        F.col("vec_id").alias("vec_b"), "band_idx", "band_val"
    )
    cand = (
        lhs.join(rhs, ["band_idx", "band_val"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )
    ea = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("va"))
    eb = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("vb"))
    # exact cosine on candidates only, vectorized: one Arrow batch ->
    # one numpy einsum per batch (the interpreted zip_with/aggregate
    # form pays a per-element closure on every candidate — the same
    # trap that cost q_dedup_embed 63 s before its GEMM rewrite)
    return (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .withColumn("cos_sim", _cos_pair("va", "vb"))
        .filter(F.col("cos_sim") >= _TAU)
        .select("vec_a", "vec_b", F.round("cos_sim", 6).alias("cos_sim"))
    )
