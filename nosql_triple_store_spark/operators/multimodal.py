"""Multimodal column handling (task brief): image/audio/video as opaque
binary columns + typed metadata, with decode / feature-extraction /
frame-sampling plumbing.

The container has no image/audio codecs (task brief), so the *decode*
step is a clearly-marked stub: `decode_media` raises NotImplementedError
for real decoding, and the pipelines use a deterministic fake feature
extractor instead. Everything Spark-side is real and tested: binary
column synthesis, Arrow transfer of bytes through mapInPandas, batch
shapes, output schemas, and per-frame explosion.

Scale notes: mapInPandas streams Arrow record batches (no per-row pickle);
binary payloads ride columnar buffers. Frame sampling is a JVM-side
sequence+explode — row expansion happens after filters, never before.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


def decode_media(payload: bytes, fmt: str):  # pragma: no cover - stub
    """Decode an image/audio/video payload. STUB: real codecs are not
    available in this environment; swap in PIL/ffmpeg/soundfile here."""
    raise NotImplementedError(
        f"media decoding for format {fmt!r} requires codec libraries "
        "(PIL/ffmpeg) not present in this environment; pipelines use "
        "deterministic fake features via _fake_features instead"
    )


def _fake_features(payload: bytes) -> dict:
    """Deterministic stand-in for decode+feature-extract: derived purely
    from the bytes so oracles can mirror it."""
    import hashlib

    return {
        "byte_len": len(payload),
        "n_frames": len(payload) // 100 + 1,
        "checksum": hashlib.md5(payload).hexdigest(),
    }


_META_SCHEMA = (
    "doc_id long, fmt string, byte_len long, n_frames long, checksum string"
)


def _extract_meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: bytes in via Arrow, features out."""
    for pdf in batches:
        feats = [_fake_features(p) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "fmt": pdf["fmt"].values,
                "byte_len": [f["byte_len"] for f in feats],
                "n_frames": [f["n_frames"] for f in feats],
                "checksum": [f["checksum"] for f in feats],
            }
        )


@register(
    "q_multimodal_meta",
    oracle="""
SELECT doc_id,
       CASE WHEN doc_id % 3 = 0 THEN 'png'
            WHEN doc_id % 3 = 1 THEN 'jpg' ELSE 'wav' END AS fmt,
       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       CAST(octet_length(encode(text)) // 100 + 1 AS BIGINT) AS n_frames,
       md5(text) AS checksum
FROM documents
""",
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata extraction end-to-end: synthesize an opaque
    binary payload (utf-8 bytes of text — deterministic), tag a fake
    format, push the bytes through mapInPandas, return typed features.

    The oracle recomputes byte_len/n_frames/checksum directly from the
    text, proving the Arrow binary round-trip is lossless.
    """
    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "png")
        .when(F.col("doc_id") % 3 == 1, "jpg")
        .otherwise("wav")
        .alias("fmt"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    return media.mapInPandas(_extract_meta, schema=_META_SCHEMA)


@register(
    "q_multimodal_frames",
    oracle="""
WITH m AS (
  SELECT doc_id,
         CAST(octet_length(encode(text)) // 100 + 1 AS BIGINT) AS n_frames,
         text
  FROM documents)
SELECT doc_id, CAST(unnest(range(0, n_frames, 2)) AS BIGINT) AS frame_idx,
       md5(text || ':' || CAST(unnest(range(0, n_frames, 2)) AS VARCHAR))
         AS frame_hash
FROM m
""",
)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: every 2nd frame of each payload becomes a row
    (sequence+explode, JVM-side); frame content is stubbed as a
    deterministic hash of (payload, frame_idx)."""
    docs = load_table(spark, sf_dir, "documents")
    m = docs.select(
        "doc_id",
        "text",
        (F.octet_length(F.encode("text", "UTF-8")) / F.lit(100)).cast("long")
        .alias("_nf"),
    ).select(
        "doc_id", "text", (F.col("_nf") + 1).alias("n_frames")
    )
    frames = m.select(
        "doc_id",
        "text",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.col("n_frames") - 1, F.lit(2).cast("long"))
        ).alias("frame_idx"),
    )
    return frames.select(
        "doc_id",
        "frame_idx",
        F.md5(
            F.concat(F.col("text"), F.lit(":"), F.col("frame_idx").cast("string"))
        ).alias("frame_hash"),
    )
