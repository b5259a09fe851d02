"""Seventh vector batch: 1-bit (sign) quantization with Hamming-space
candidate search and exact rerank.

Lineage: the binary-quantization retrieval recipe modern vector stores
ship (32x smaller index, popcount distance, exact rerank on a
candidate pool) — the 1-bit end of the engine's quantization spectrum
(int8 q_vector_quantize, PQ codebooks q_vector_pq, IVF cells
q_vector_knn_ivf). Everything before the final cosine is INTEGER
arithmetic (bit packing, xor, popcount), so the candidate set is
bit-identical across engines and the whole query oracle-checks
exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.vectors import as_double_array, cosine_col
from ..registry import register

_BQ_CANDIDATES = 32
_BQ_TOPK = 10

# two 32-bit words (lo = dims 1..32, hi = dims 33..64) sidestep the
# sign bit of a single 64-bit mask; DuckDB's ^ is POWER, so xor() only.
_LO_SQL = (
    "(SELECT SUM(CASE WHEN e[i] > 0"
    " THEN CAST(1 AS BIGINT) << (i - 1) ELSE 0 END)"
    " FROM unnest(range(1, 33)) AS r(i))"
)
_HI_SQL = (
    "(SELECT SUM(CASE WHEN e[i] > 0"
    " THEN CAST(1 AS BIGINT) << (i - 33) ELSE 0 END)"
    " FROM unnest(range(33, 65)) AS r(i))"
)


@register(
    "q_vector_binary_quant",
    oracle=f"""
WITH m AS (
  SELECT vec_id, label, embedding,
         {_LO_SQL} AS lo, {_HI_SQL} AS hi
  FROM (SELECT vec_id, label, embedding, embedding::DOUBLE[] AS e
        FROM embeddings)),
p AS (SELECT lo AS plo, hi AS phi, embedding::DOUBLE[] AS pe
      FROM m WHERE vec_id = 0),
ham AS (
  SELECT m.vec_id, m.label, m.embedding,
         CAST(bit_count(xor(m.lo, p.plo))
              + bit_count(xor(m.hi, p.phi)) AS BIGINT) AS hamming,
         p.pe
  FROM m, p WHERE m.vec_id <> 0),
cand AS (
  SELECT * FROM ham ORDER BY hamming, vec_id LIMIT {_BQ_CANDIDATES}),
rer AS (
  SELECT vec_id, label, hamming,
         ROUND(list_cosine_similarity(embedding::DOUBLE[], pe), 6)
           AS cos_sim
  FROM cand)
SELECT vec_id, label, hamming, cos_sim + 0 AS cos_sim
FROM rer ORDER BY cos_sim DESC, vec_id LIMIT {_BQ_TOPK}
""",
)
def q_vector_binary_quant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-bit quantized retrieval: pack each embedding's sign pattern
    into two 32-bit words, shortlist the {_BQ_CANDIDATES} nearest
    vectors to probe 0 by Hamming distance (xor + popcount — the whole
    index is 8 bytes/vector, 32x smaller than float32), then rerank
    the shortlist by EXACT cosine and return the top {_BQ_TOPK}. The
    quantize → popcount → shortlist pipeline is pure integer
    arithmetic, so candidates are bit-identical across engines; only
    the final rerank touches floats (rounded at the repo grain).

    Scale: packing is a codegen'd per-row fold; the Hamming shortlist
    is TakeOrdered (per-partition partial top-k); rerank touches
    {_BQ_CANDIDATES} rows. At 100 TB the packed index column is what
    you'd persist (8 bytes x n), scanning it instead of the float
    vectors — a 32x I/O cut before any SIMD tricks.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    pack = (
        "aggregate(sequence({a}, {b}), CAST(0 AS BIGINT), (acc, i) ->"
        " acc + IF(element_at(CAST(embedding AS ARRAY<DOUBLE>), CAST(i"
        " AS INT)) > 0D, shiftleft(CAST(1 AS BIGINT), CAST(i - {a} AS"
        " INT)), CAST(0 AS BIGINT)))"
    )
    m = emb.select(
        "vec_id",
        "label",
        "embedding",
        F.expr(pack.format(a=1, b=32)).alias("lo"),
        F.expr(pack.format(a=33, b=64)).alias("hi"),
    )
    p = m.filter(F.col("vec_id") == 0).select(
        F.col("lo").alias("plo"),
        F.col("hi").alias("phi"),
        as_double_array("embedding").alias("pe"),
    )
    ham = (
        m.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(p))
        .select(
            "vec_id",
            "label",
            "embedding",
            "pe",
            (
                F.bit_count(F.col("lo").bitwiseXOR(F.col("plo")))
                + F.bit_count(F.col("hi").bitwiseXOR(F.col("phi")))
            ).cast("long").alias("hamming"),
        )
    )
    cand = ham.orderBy(F.asc("hamming"), F.asc("vec_id")).limit(
        _BQ_CANDIDATES
    )
    rer = cand.select(
        "vec_id",
        "label",
        "hamming",
        F.round(cosine_col(as_double_array("embedding"), F.col("pe")), 6)
        .alias("cos_sim"),
    )
    return (
        rer.orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(_BQ_TOPK)
        .select(
            "vec_id",
            "label",
            "hamming",
            (F.col("cos_sim") + F.lit(0.0)).alias("cos_sim"),
        )
    )
