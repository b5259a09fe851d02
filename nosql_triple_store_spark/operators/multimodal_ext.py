"""Multimodal extension batch: energy-based voice-activity detection
over decoded audio.

Lineage: the segmentation step an audio training-data pipeline runs
between decode and transcription — find speech regions, drop silence,
budget ASR compute by voiced seconds. Follows multimodal.py's
synthesized-container convention: each doc gets a deterministic PCM16
signal, containered as a real RIFF/WAVE file and decoded back by the
independent chunk-walking parser, so the VAD operates on genuinely
decoded bytes while the oracle recomputes the expected segmentation
analytically from the signal formula (a header bug, byte-order slip,
or framing off-by-one breaks the hash match).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..registry import register
from .multimodal import decode_wav_pcm16, encode_wav_pcm16

_VAD_RATE = 8000
_VAD_FRAME = 80  # 10 ms at 8 kHz
_VAD_THRESHOLD = 100  # mean |amplitude|: voiced ~800, silence <= 10


@register(
    "q_multimodal_audio_vad",
    oracle="""
WITH p AS (
  SELECT doc_id, 12 + doc_id % 9 AS nf FROM documents),
fr AS (
  SELECT doc_id, nf, unnest(range(nf)) AS f FROM p),
vo AS (
  SELECT doc_id, f,
         f - row_number() OVER (PARTITION BY doc_id ORDER BY f) AS grp
  FROM fr WHERE ((doc_id * 13 + f * 7) % 5) < 2),
seg AS (
  SELECT doc_id, grp, CAST(COUNT(*) AS BIGINT) AS run
  FROM vo GROUP BY 1, 2),
agg AS (
  SELECT doc_id, SUM(run) AS n_voiced, COUNT(*) AS n_segments,
         MAX(run) AS longest FROM seg GROUP BY 1)
SELECT p.doc_id, CAST(p.nf AS BIGINT) AS n_frames,
       CAST(COALESCE(a.n_voiced, 0) AS BIGINT) AS n_voiced,
       CAST(COALESCE(a.n_segments, 0) AS BIGINT) AS n_segments,
       CAST(COALESCE(a.longest, 0) AS BIGINT) AS longest_run_frames,
       CAST(COALESCE(a.n_voiced, 0) * 10 AS BIGINT) AS voiced_ms
FROM p LEFT JOIN agg a USING (doc_id)
""",
)
def q_multimodal_audio_vad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Energy VAD over REAL decoded audio: per doc, synthesize a
    deterministic speech/silence PCM16 signal (voiced frames are a
    ±800 square wave, silence frames |amp| <= 10), container it as an
    actual WAV, decode the bytes back, then segment by 10 ms frame
    energy (mean |x| >= {_VAD_THRESHOLD}) and merge consecutive voiced
    frames into speech segments. Output: per-doc frame/segment census
    and voiced milliseconds — the numbers an ASR budget planner reads.
    The oracle re-derives the segmentation analytically from the
    voiced-frame formula with a gaps-islands window, so the decode →
    frame → threshold → merge chain must be exactly right.

    Scale: one mapInPandas over Arrow batches; each task decodes and
    segments its own docs with numpy (no shuffle at all — the kernel
    is embarrassingly parallel, the same shape reading parquet binary
    columns at 100 TB). The in-kernel merge is a linear scan over
    frames per doc, bounded by the payload length.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [], "n_frames": [], "n_voiced": [],
                "n_segments": [], "longest_run_frames": [], "voiced_ms": [],
            }
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                nf = 12 + doc_id % 9
                i = np.arange(nf * _VAD_FRAME, dtype=np.int64)
                f = i // _VAD_FRAME
                voiced = ((doc_id * 13 + f * 7) % 5) < 2
                tone = np.where(i % 2 == 0, 800, -800)
                noise = ((doc_id + i) % 21) - 10
                sig = np.where(voiced, tone, noise).astype(np.int16)
                payload = encode_wav_pcm16(sig, _VAD_RATE)
                _, dec = decode_wav_pcm16(payload)
                frames = (
                    np.abs(dec.astype(np.int64))
                    .reshape(nf, _VAD_FRAME)
                    .mean(axis=1)
                )
                active = frames >= _VAD_THRESHOLD
                n_voiced = int(active.sum())
                # run-length encode the voiced mask
                edges = np.flatnonzero(np.diff(active.astype(np.int8)))
                bounds = np.concatenate(([-1], edges, [nf - 1]))
                runs = np.diff(bounds)
                kinds = active[bounds[1:]]
                voiced_runs = runs[kinds]
                out["doc_id"].append(doc_id)
                out["n_frames"].append(nf)
                out["n_voiced"].append(n_voiced)
                out["n_segments"].append(len(voiced_runs))
                out["longest_run_frames"].append(
                    int(voiced_runs.max()) if len(voiced_runs) else 0
                )
                out["voiced_ms"].append(n_voiced * 10)
            yield pd.DataFrame(out)

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return docs.repartition(16).mapInPandas(
        kernel,
        schema=(
            "doc_id long, n_frames long, n_voiced long, "
            "n_segments long, longest_run_frames long, voiced_ms long"
        ),
    )
