"""Twenty-fifth extension batch: training-shard manifest.

The last step of a training-data pipeline: assign every document to one
of N export shards and emit the manifest (per-shard counts, byte
volumes, id ranges) the downstream loader consumes. Assignment is
md5-based — the same engine-independent determinism contract as
q_sample_deterministic/q_sample_weighted, so re-running the export on
any engine or cluster layout reproduces byte-identical shards."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_N_SHARDS = 8

_MANIFEST_ORACLE = f"""
WITH assigned AS (
  SELECT doc_id, lang,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
              % {_N_SHARDS} AS BIGINT) AS shard
  FROM documents)
SELECT shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
       CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
FROM assigned GROUP BY shard
"""


@register("q_multimodal_shard_manifest", oracle=_MANIFEST_ORACLE)
def q_multimodal_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard manifest: every document hashed (md5 of its id —
    content-independent, so re-ingesting a fixed corpus never moves
    docs between shards) into {n} shards, with the per-shard census a
    WebDataset/TFRecord-style loader needs: document count, byte
    volume, language spread, id range. Hash sharding balances bytes to
    within a few percent without a sort (asserted in tests); one
    partial-aggregable groupBy. The actual export is
    `df.where(shard = i).write...` per shard or a single
    partitionBy('shard') write — the manifest and the layout share the
    assignment expression. Spark's conv() parses the hex md5 prefix;
    DuckDB casts a '0x' literal — both yield the identical integer, so
    shard assignment matches bit-for-bit."""
    docs = load_table(spark, sf_dir, "documents")
    assigned = docs.select(
        "doc_id",
        "lang",
        F.octet_length(F.encode("text", "UTF-8")).cast("long").alias(
            "n_bytes"
        ),
        (
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
                16,
                10,
            ).cast("long")
            % _N_SHARDS
        ).alias("shard"),
    )
    return assigned.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_bytes").alias("total_bytes"),
        F.countDistinct("lang").alias("n_langs"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


q_multimodal_shard_manifest.__doc__ = (
    q_multimodal_shard_manifest.__doc__.format(n=_N_SHARDS)
)
