"""Scalar quantization (int8) for embedding storage — the 4x storage /
bandwidth reduction every large vector corpus applies before ANN
serving. Codes are exact integer arithmetic end-to-end so the operator
is oracle-checkable; reconstruction error is bounded by construction and
asserted in tests/test_vector_quant.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

# Fixed symmetric range: the fixture embeddings are unit-ish gaussian
# components (probed |x| < 1); a fixed scale keeps codes comparable
# across shards WITHOUT a global min/max pass (the per-corpus-scan
# alternative, noted for completeness, costs one extra aggregate).
_SCALE = 1.0
_LEVELS = 127


@register(
    "q_vector_quantize",
    oracle=f"""
WITH q AS (
  SELECT vec_id, label,
         [CAST(round(LEAST(GREATEST(x, -{_SCALE}), {_SCALE})
                     * {_LEVELS} / {_SCALE}) AS BIGINT)
          FOR x IN embedding] AS codes
  FROM embeddings)
SELECT vec_id, label,
       CAST(len(codes) AS BIGINT) AS dim,
       CAST(list_sum([abs(c) FOR c IN codes]) AS BIGINT) AS l1_code,
       CAST(list_max(codes) AS BIGINT) AS max_code,
       CAST(list_min(codes) AS BIGINT) AS min_code
FROM q
""",
)
def q_vector_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization: clamp to [-1, 1], scale to 127
    levels, round — emitted as per-vector code summaries (dim, L1 norm
    of codes, min/max code) so the oracle compares exact ints rather
    than 64-wide arrays. round() here is applied to x*127 where x is a
    raw stored float — both engines scale the identical double and the
    probability of landing on a .5 boundary is zero for generic floats
    (rounding of DERIVED sums is the dangerous case, not of raw-value
    products by an integer constant)."""
    emb = load_table(spark, sf_dir, "embeddings")
    codes = F.transform(
        "embedding",
        lambda x: F.round(
            F.greatest(F.least(x.cast("double"), F.lit(_SCALE)), F.lit(-_SCALE))
            * _LEVELS
            / _SCALE
        ).cast("long"),
    )
    q = emb.select("vec_id", "label", codes.alias("codes"))
    return q.select(
        "vec_id",
        "label",
        F.size("codes").cast("long").alias("dim"),
        F.aggregate(
            F.transform("codes", lambda c: F.abs(c)),
            F.lit(0).cast("long"),
            lambda acc, c: acc + c,
        ).alias("l1_code"),
        F.array_max("codes").alias("max_code"),
        F.array_min("codes").alias("min_code"),
    )
