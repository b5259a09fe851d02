"""Forty-seventh extension batch: the feature-hashing trick.

Lineage: the classic hashed bag-of-words featurizer (Weinberger et
al., ICML 2009) — tokens hash into a fixed number of buckets, giving
every document a dense fixed-width count vector with NO vocabulary
dictionary to build, ship, or keep consistent — the property that
matters at 100 TB, where a vocab dictionary is itself a distributed
artifact (sources/dictionary.py). Collisions are the accepted tax.
Emitted in long format (doc, bucket, count) — the sparse
representation a trainer's data loader consumes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.textfns import TOKS_SQL, tokens_col
from ..registry import register

_FH_BUCKETS = 64
_HASH_SQL = (
    "CAST(((({key}) % 2147483648) * 2654435761 + 12345) % 4294967296"
    " AS BIGINT)"
)
# weak-but-identical cross-engine string key: first two char codes +
# length (collisions are FINE — feature hashing embraces them; what
# matters is both engines hash identically)
_STRKEY = (
    "(ascii(substr({t}, 1, 1)) * 961"
    " + COALESCE(ascii(substr({t}, 2, 1)), 0) * 31 + length({t}))"
)


@register(
    "q_text_feature_hashing",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest({TOKS_SQL}) AS t FROM documents),
h AS (
  SELECT doc_id,
         {_HASH_SQL.format(key=_STRKEY.format(t='t'))} % {_FH_BUCKETS}
           AS bucket
  FROM tok)
SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS tf
FROM h GROUP BY doc_id, bucket
""",
)
def q_text_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick featurizer: every token maps to one of
    {_FH_BUCKETS} buckets via the affine hash of a character-code key,
    and each document becomes a sparse (bucket, term-frequency) vector
    — no vocabulary pass, no dictionary artifact, stable width
    regardless of corpus growth. The bucket function is pure integer
    arithmetic on character codes, so the feature matrix is
    bit-identical across engines (collisions included — they are the
    method's accepted tax, not a bug).

    Scale: explode + one hash aggregation on (doc, bucket); compare
    sources/dictionary.py's two-pass id assignment, which this trick
    exists to avoid. The long format IS the shuffle-friendly layout —
    a dense array pivot is one groupBy away when a trainer wants it.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens_col()).alias("t"))
    key = _STRKEY.format(t="t")
    h = tok.select(
        "doc_id",
        (F.expr(_HASH_SQL.format(key=key)) % _FH_BUCKETS).alias("bucket"),
    )
    return h.groupBy("doc_id", "bucket").agg(
        F.count(F.lit(1)).alias("tf")
    )
