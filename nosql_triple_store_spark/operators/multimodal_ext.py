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
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from ..widths import fanout_width
from .multimodal import decode_wav_pcm16, encode_wav_pcm16
from ..materialize import materialize

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
    return docs.repartition(fanout_width(spark)).mapInPandas(
        kernel,
        schema=(
            "doc_id long, n_frames long, n_voiced long, "
            "n_segments long, longest_run_frames long, voiced_ms long"
        ),
    )


_CUT_MAD_MILLI = 60_000  # mean |pixel delta| >= 60 between frames = cut

# Per-channel pixel value: base(p) in [0,64) + a_k*(f mod 3) + 120*(scene
# parity). Values stay < 256 for every doc/frame/pixel, so frame deltas
# never wrap: within-scene |delta| = a_k (5/7/9), scene-boundary |delta| =
# |120 - 2*a_k| >= 102 — the detector threshold sits in a guaranteed gap.
_PIX_SQL = (
    "((({c} * doc_id + {m} * p) % 64)"
    " + {a} * (({f}) % 3) + 120 * ((({f}) // 3) % 2))"
)
_CH = ((1, 1, 5), (2, 3, 7), (3, 7, 9))  # (c, m, a) per channel


def _delta_sql(f2: str, f1: str) -> str:
    return " + ".join(
        "ABS("
        + _PIX_SQL.format(c=c, m=m, a=a, f=f2)
        + " - "
        + _PIX_SQL.format(c=c, m=m, a=a, f=f1)
        + ")"
        for c, m, a in _CH
    )


@register(
    "q_multimodal_scene_cut",
    oracle=f"""
WITH d AS (
  SELECT doc_id, 8 + doc_id % 5 AS w, 6 + doc_id % 3 AS h,
         6 + doc_id % 4 AS n_frames
  FROM documents),
tr AS (
  SELECT doc_id, w, h, unnest(range(n_frames - 1)) AS f FROM d),
px AS (
  SELECT doc_id, w, h, f, unnest(range(w * h)) AS p FROM tr),
dl AS (
  SELECT doc_id, w, h, f,
         {_delta_sql("f + 1", "f")} AS s
  FROM px),
mad AS (
  SELECT doc_id, f, (SUM(s) * 1000) // (w * h * 3) AS mad_milli
  FROM dl GROUP BY doc_id, f, w, h)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_transitions,
       CAST(SUM(CASE WHEN mad_milli >= {_CUT_MAD_MILLI} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_cuts,
       CAST(SUM(CASE WHEN mad_milli >= {_CUT_MAD_MILLI} THEN 1 ELSE 0 END)
            + 1 AS BIGINT) AS n_scenes,
       CAST(MAX(mad_milli) AS BIGINT) AS max_mad_milli,
       CAST(MIN(mad_milli) AS BIGINT) AS min_mad_milli
FROM mad GROUP BY doc_id
""",
)
def q_multimodal_scene_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-boundary (scene cut) detection over REAL decoded video: per
    doc, render 6-9 RGB frames where every 3rd frame starts a new
    "scene" (a large deterministic color shift), container them as an
    actual concatenated-P6 stream, decode the bytes back with the
    header-walking parser, and threshold the mean absolute pixel delta
    between consecutive DECODED frames (exact integer milli-units —
    (sum|Δ|*1000) div n_px). Within-scene deltas are exactly 5/7/9 per
    channel; scene boundaries jump past 100 (the fixture's pixel values
    never wrap mod 256, so the gap is guaranteed for every doc) — the
    classic
    intensity-difference cut detector every video curriculum pipeline
    runs before frame sampling. The oracle recomputes each transition's
    delta analytically from the pixel formulas, so a decode stride bug
    or off-by-one in the frame pairing breaks the hash match.

    Scale: mapInPandas over Arrow batches, numpy per task, zero
    shuffle; per-doc work is linear in payload bytes.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .multimodal import decode_ppm_stream, encode_ppm

        for pdf in batches:
            out = {
                "doc_id": [], "n_transitions": [], "n_cuts": [],
                "n_scenes": [], "max_mad_milli": [], "min_mad_milli": [],
            }
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                w, h = 8 + doc_id % 5, 6 + doc_id % 3
                n_frames = 6 + doc_id % 4
                p = np.arange(w * h, dtype=np.int64)
                video = b"".join(
                    encode_ppm(
                        np.stack(
                            [
                                (c * doc_id + m * p) % 64
                                + a * (f % 3)
                                + 120 * ((f // 3) % 2)
                                for c, m, a in _CH
                            ],
                            axis=1,
                        ).reshape(h, w, 3)
                    )
                    for f in range(n_frames)
                )
                frames = [
                    fr.astype(np.int64) for fr in decode_ppm_stream(video)
                ]
                mads = [
                    int(
                        np.abs(frames[f + 1] - frames[f]).sum() * 1000
                        // (w * h * 3)
                    )
                    for f in range(len(frames) - 1)
                ]
                cuts = sum(1 for m in mads if m >= _CUT_MAD_MILLI)
                out["doc_id"].append(doc_id)
                out["n_transitions"].append(len(mads))
                out["n_cuts"].append(cuts)
                out["n_scenes"].append(cuts + 1)
                out["max_mad_milli"].append(max(mads))
                out["min_mad_milli"].append(min(mads))
            yield pd.DataFrame(out)

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return docs.repartition(fanout_width(spark)).mapInPandas(
        kernel,
        schema=(
            "doc_id long, n_transitions long, n_cuts long, "
            "n_scenes long, max_mad_milli long, min_mad_milli long"
        ),
    )


_AV_AUDIO_FRAME_MS = 100  # VAD frame timeline for alignment
_AV_SCENE_MS = 600  # 3 video frames x 200 ms


@register(
    "q_multimodal_av_align",
    oracle=f"""
WITH p AS (
  SELECT doc_id, 12 + doc_id % 9 AS nf_audio,
         6 + doc_id % 4 AS nf_video
  FROM documents),
vo AS (
  SELECT p.doc_id, f,
         f - row_number() OVER (PARTITION BY p.doc_id ORDER BY f) AS grp
  FROM p CROSS JOIN unnest(range(p.nf_audio)) AS r(f)
  WHERE ((p.doc_id * 13 + f * 7) % 5) < 2),
seg AS (
  SELECT doc_id, MIN(f) AS s, MAX(f) AS e
  FROM vo GROUP BY doc_id, grp),
al AS (
  SELECT seg.doc_id,
         LEAST(((seg.s + seg.e + 1) * {_AV_AUDIO_FRAME_MS} // 2)
                 // {_AV_SCENE_MS},
               ((p.nf_video - 1) // 3 + 1) - 1) AS scene_idx
  FROM seg JOIN p USING (doc_id))
SELECT doc_id, CAST(scene_idx AS BIGINT) AS scene_idx,
       CAST(COUNT(*) AS BIGINT) AS n_segments
FROM al GROUP BY doc_id, scene_idx
""",
)
def q_multimodal_av_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal temporal alignment: for every doc, decode BOTH
    payloads — the WAV speech track (energy-VAD segmentation, frames
    mapped to a {_AV_AUDIO_FRAME_MS} ms timeline) and the P6 video
    (scene boundaries from decoded pixel deltas) — then assign each
    speech segment's midpoint to its containing scene (scenes span
    {_AV_SCENE_MS} ms = 3 video frames; trailing segments clamp to the
    last scene). This is the subtitle/shot alignment join an
    audio-visual training pipeline runs before captioning: which
    utterances belong to which shot. Midpoints are exact half-integers
    scaled to integers; the oracle re-derives both modalities'
    segmentations analytically, so EITHER decoder drifting breaks the
    match.

    Scale: two mapInPandas kernels (audio segments, video scene
    count), each embarrassingly parallel over Arrow batches, joined on
    doc_id — co-partitioned by repartitioning both on the same key;
    the alignment arithmetic is a codegen'd integer expression.
    """

    def audio_segments(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "s": [], "e": []}
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                nf = 12 + doc_id % 9
                i = np.arange(nf * _VAD_FRAME, dtype=np.int64)
                f = i // _VAD_FRAME
                voiced = ((doc_id * 13 + f * 7) % 5) < 2
                tone = np.where(i % 2 == 0, 800, -800)
                noise = ((doc_id + i) % 21) - 10
                sig = np.where(voiced, tone, noise).astype(np.int16)
                _, dec = decode_wav_pcm16(encode_wav_pcm16(sig, _VAD_RATE))
                frames = (
                    np.abs(dec.astype(np.int64))
                    .reshape(nf, _VAD_FRAME)
                    .mean(axis=1)
                )
                active = frames >= _VAD_THRESHOLD
                start = None
                for idx in range(nf):
                    if active[idx] and start is None:
                        start = idx
                    elif not active[idx] and start is not None:
                        out["doc_id"].append(doc_id)
                        out["s"].append(start)
                        out["e"].append(idx - 1)
                        start = None
                if start is not None:
                    out["doc_id"].append(doc_id)
                    out["s"].append(start)
                    out["e"].append(nf - 1)
            yield pd.DataFrame(out)

    def video_scenes(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        from .multimodal import decode_ppm_stream, encode_ppm

        for pdf in batches:
            out = {"doc_id": [], "n_scenes": []}
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                w, h = 8 + doc_id % 5, 6 + doc_id % 3
                n_frames = 6 + doc_id % 4
                p = np.arange(w * h, dtype=np.int64)
                video = b"".join(
                    encode_ppm(
                        np.stack(
                            [
                                (c * doc_id + m * p) % 64
                                + a * (f % 3)
                                + 120 * ((f // 3) % 2)
                                for c, m, a in _CH
                            ],
                            axis=1,
                        ).reshape(h, w, 3)
                    )
                    for f in range(n_frames)
                )
                frames = [
                    fr.astype(np.int64) for fr in decode_ppm_stream(video)
                ]
                cuts = sum(
                    1
                    for f in range(len(frames) - 1)
                    if int(
                        np.abs(frames[f + 1] - frames[f]).sum() * 1000
                        // (w * h * 3)
                    )
                    >= _CUT_MAD_MILLI
                )
                out["doc_id"].append(doc_id)
                out["n_scenes"].append(cuts + 1)
            yield pd.DataFrame(out)

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    segs = docs.repartition(fanout_width(spark)).mapInPandas(
        audio_segments, schema="doc_id long, s long, e long"
    )
    scenes = docs.repartition(fanout_width(spark)).mapInPandas(
        video_scenes, schema="doc_id long, n_scenes long"
    )
    al = segs.join(scenes, "doc_id").select(
        "doc_id",
        F.least(
            F.expr(
                f"(s + e + 1) * {_AV_AUDIO_FRAME_MS} div 2"
                f" div {_AV_SCENE_MS}"
            ),
            F.col("n_scenes") - 1,
        ).alias("scene_idx"),
    )
    return al.groupBy("doc_id", "scene_idx").agg(
        F.count(F.lit(1)).alias("n_segments")
    )


_PHASH_CLASSES = 25
# template classes scale with the corpus at a constant ~200 docs per
# class (the sf0.1 ratio, so every driver SF keeps its historical 25
# classes bit-identically): with FIXED classes every same-class pair
# lies within the Hamming threshold, making the RESULT itself
# quadratic in docs — the r7 sf1 sweep measured 89.5 s at 50k docs.
# Constant class size keeps near-dup pairs (and band buckets) O(n).
_PHASH_TARGET_CLASS_SIZE = 200
_PHASH_HAM = 7
_PHASH_BANDS = 8  # 8 bands x 8 bits: any pair with hamming <= 7 shares one
# gray value: per-class template + tiny per-doc jitter (near-dup classes)
# template gray ramp: per-class OFFSET (cls*37 mod 200) and per-class
# SLOPE (11 + 13*(cls mod 17)). The slope term is what makes classes
# differ STRUCTURALLY under aHash: bits are (pixel > mean), which is
# insensitive to a constant offset except at the mod-200 wrap points —
# with a shared slope the whole family spans only ~200 hash patterns,
# so the ham<=7 pair count is Θ(n²/200) no matter how many classes
# exist (measured 13.25M pairs at 15k docs before the fix). Distinct
# wrap counts per slope family make hashes differ across families;
# 17 slopes x 200 offsets = 3400 distinct templates.
_GRAY_SQL = (
    "((({cls}) * 37 + ({p}) * (11 + 13 * (({cls}) % 17))) % 200"
    " + (({doc}) * 7 + ({p})) % 5)"
)


_PHASH_G = _GRAY_SQL.format(cls="d.cls", p="i", doc="d.doc_id")


@register(
    "q_multimodal_image_phash",
    oracle=f"""
WITH ncls AS (
  SELECT GREATEST({_PHASH_CLASSES},
                  CAST(FLOOR(COUNT(*) / {_PHASH_TARGET_CLASS_SIZE}.0)
                       AS BIGINT)) AS k
  FROM documents),
d AS (SELECT doc_id, doc_id % k AS cls FROM documents, ncls),
g AS (
  SELECT d.doc_id,
         (SELECT SUM({_PHASH_G})
          FROM unnest(range(64)) AS r(i)) AS total
  FROM d),
m AS (
  SELECT d.doc_id, d.cls,
         (SELECT SUM(CASE WHEN {_PHASH_G} * 64 > g.total
                          THEN CAST(1 AS BIGINT) << CAST(i AS INT)
                          ELSE 0 END)
          FROM unnest(range(32)) AS r(i)) AS lo,
         (SELECT SUM(CASE WHEN {_PHASH_G} * 64 > g.total
                          THEN CAST(1 AS BIGINT) << CAST(i - 32 AS INT)
                          ELSE 0 END)
          FROM unnest(range(32, 64)) AS r(i)) AS hi
  FROM d JOIN g ON g.doc_id = d.doc_id)
SELECT a.doc_id AS d1, b.doc_id AS d2,
       CAST(bit_count(xor(a.lo, b.lo))
            + bit_count(xor(a.hi, b.hi)) AS BIGINT) AS hamming,
       (a.cls = b.cls) AS same_class
FROM m a JOIN m b ON b.doc_id > a.doc_id
WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi))
      <= {_PHASH_HAM}
""",
)
def q_multimodal_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image near-duplication over REAL decoded
    rasters: each doc renders an 8x8 grayscale image from its
    template class (doc_id mod {_PHASH_CLASSES}) plus tiny per-doc
    jitter, containers it as an actual P6 file, decodes the bytes
    back, and computes the average-hash (aHash): bit p set iff
    pixel_p > image mean, compared in exact integers (px*64 > sum).
    Near-duplicate pairs are those within Hamming {_PHASH_HAM} —
    found via {_PHASH_BANDS} bands of 8 bits (pigeonhole: a pair
    within Hamming {_PHASH_HAM} shares at least one exact band), band
    bucket-join over DISTINCT hash values (exact-hash groups collapse
    first — see the inline round-8 note), then exact popcount verify
    and an output-bound expansion back to document pairs. The oracle
    brute-forces all pairs from the pixel formulas, proving the
    banded candidate generation LOSSLESS at the threshold — same
    certify-the-optimization pattern as the LSH/df-cap proofs.

    Scale: the index is 8 bytes/image; the pairwise join touches one
    row per DISTINCT hash (exact-duplicate images — ubiquitous in
    crawled corpora — cost nothing extra), and the doc-pair expansion
    emits only real result rows. Decode stays embarrassingly parallel
    in mapInPandas.
    """

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    # bounded layout scalar: class count at constant class size (see
    # _PHASH_TARGET_CLASS_SIZE note)
    n_classes = max(
        _PHASH_CLASSES, docs.count() // _PHASH_TARGET_CLASS_SIZE
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .multimodal import decode_ppm, encode_ppm

        for pdf in batches:
            out = {"doc_id": [], "cls": [], "lo": [], "hi": []}
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                cls = doc_id % n_classes
                p = np.arange(64, dtype=np.int64)
                gray = (cls * 37 + p * (11 + 13 * (cls % 17))) % 200 + (
                    doc_id * 7 + p
                ) % 5
                img = np.stack([gray, gray, gray], axis=1).reshape(8, 8, 3)
                dec = decode_ppm(encode_ppm(img)).astype(np.int64)
                gvals = dec[:, :, 0].reshape(64)
                total = int(gvals.sum())
                bits = gvals * 64 > total
                lo = int(sum(1 << i for i in range(32) if bits[i]))
                hi = int(sum(1 << (i - 32) for i in range(32, 64) if bits[i]))
                out["doc_id"].append(doc_id)
                out["cls"].append(cls)
                out["lo"].append(lo)
                out["hi"].append(hi)
            yield pd.DataFrame(out)

    m = docs.repartition(fanout_width(spark)).mapInPandas(
        kernel, schema="doc_id long, cls long, lo long, hi long"
    ).transform(materialize)
    # EXACT-GROUP COLLAPSE before the pairwise join (round 8, the fix
    # for the sf3 blowup): perceptual hashes cluster — many images
    # share a hash bit-exactly (here: class templates; in a real
    # corpus: exact-duplicate images) — so the banded near-dup join
    # runs over DISTINCT hashes (D rows, ~n/200 here), not documents.
    # The doc-level candidate join enumerated ~n²/256 band-bucket
    # matches at saturation (62 s at derived sf3, quadratic); the
    # group-level join enumerates ~D²/256 (thousands), and expanding
    # surviving hash pairs back to doc pairs is output-bound. Banding
    # stays lossless: a hash pair within Hamming {_PHASH_HAM} differs
    # in at most {_PHASH_HAM} of the 8 byte-bands, so one band is
    # untouched (pigeonhole) — same guarantee, applied to groups.
    groups = m.select("lo", "hi").distinct().transform(materialize)

    def banded(df: DataFrame, suffix: str) -> DataFrame:
        exprs = []
        for b in range(_PHASH_BANDS):
            word = "lo" if b < 4 else "hi"
            shift = (b % 4) * 8
            exprs.append(
                F.struct(
                    F.lit(b).alias("band"),
                    F.expr(f"(({word} >> {shift}) & 255)").alias("bkey"),
                )
            )
        out = df.select(
            F.col("lo").alias(f"lo{suffix}"),
            F.col("hi").alias(f"hi{suffix}"),
            F.explode(F.array(*exprs)).alias("bk"),
        )
        return out.select(
            f"lo{suffix}",
            f"hi{suffix}",
            F.col("bk.band").alias(f"band{suffix}"),
            F.col("bk.bkey").alias(f"bkey{suffix}"),
        )

    ham = (
        F.bit_count(F.col("lo1").bitwiseXOR(F.col("lo2")))
        + F.bit_count(F.col("hi1").bitwiseXOR(F.col("hi2")))
    ).cast("long")
    # unordered DISTINCT-hash pairs within the Hamming radius (strict
    # struct order picks one orientation), plus the identity pairs
    # (h, h) whose members are exact-hash duplicates of each other
    gpairs = (
        banded(groups, "1")
        .join(
            banded(groups, "2"),
            (F.col("band1") == F.col("band2"))
            & (F.col("bkey1") == F.col("bkey2"))
            & (
                F.struct(F.col("lo1"), F.col("hi1"))
                < F.struct(F.col("lo2"), F.col("hi2"))
            )
            & (ham <= _PHASH_HAM),
        )
        .select("lo1", "hi1", "lo2", "hi2")
        .distinct()
        .unionByName(
            groups.select(
                F.col("lo").alias("lo1"),
                F.col("hi").alias("hi1"),
                F.col("lo").alias("lo2"),
                F.col("hi").alias("hi2"),
            )
        )
    )
    # expand hash pairs to doc pairs: two joins keyed by hash, each
    # output-bound (every emitted row is a real result row); the pair
    # is canonicalized to d1 < d2 (symmetric hamming/same_class)
    a = m.select(
        F.col("lo").alias("lo1"), F.col("hi").alias("hi1"),
        F.col("doc_id").alias("da"), F.col("cls").alias("ca"),
    )
    b = m.select(
        F.col("lo").alias("lo2"), F.col("hi").alias("hi2"),
        F.col("doc_id").alias("db"), F.col("cls").alias("cb"),
    )
    return (
        gpairs.join(a, ["lo1", "hi1"])
        .join(b, ["lo2", "hi2"])
        .filter(F.col("da") != F.col("db"))
        .filter(
            # identity hash pairs would emit each member pair twice
            # (both orientations); keep the da < db one only
            (F.struct("lo1", "hi1") < F.struct("lo2", "hi2"))
            | (F.col("da") < F.col("db"))
        )
        .select(
            F.least("da", "db").alias("d1"),
            F.greatest("da", "db").alias("d2"),
            ham.alias("hamming"),
            (F.col("ca") == F.col("cb")).alias("same_class"),
        )
    )


@register(
    "q_multimodal_decode_jpeg",
    oracle="""
WITH d AS (
  SELECT doc_id,
         8 * (2 + doc_id % 3) AS w,
         8 * (2 + doc_id % 2) AS h
  FROM documents),
b AS (
  SELECT doc_id, w, h,
         unnest(range((w // 8) * (h // 8))) AS bi
  FROM d),
v AS (
  SELECT doc_id, w, h, 2 * ((doc_id * 7 + bi * 13) % 128) AS val FROM b)
SELECT doc_id,
       CAST(w AS BIGINT) AS width,
       CAST(h AS BIGINT) AS height,
       ROUND(AVG(val), 6) AS mean_px,
       CAST(MIN(val) AS BIGINT) AS min_px,
       CAST(MAX(val) AS BIGINT) AS max_px
FROM v GROUP BY doc_id, w, h
""",
)
def q_multimodal_decode_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BASELINE JPEG decode end-to-end (VERDICT r4 #6): per doc,
    rasterize a deterministic block pattern, encode it as a REAL
    baseline JFIF file (functions/jpeg.py — forward DCT, Annex K.1
    quantization, standard K.3/K.5 Huffman tables, byte stuffing),
    then decode the compressed bytes back through the independent
    marker-walking Huffman/IDCT decoder and derive pixel stats from
    the decoded raster ONLY. The pattern uses constant 8x8 blocks with
    even level-shift, which the K.1 DC quantum (16) quantizes
    LOSSLESSLY — so the analytic SQL oracle matches bit-for-bit even
    though JPEG is lossy in general (lossy-path error bounds are
    covered by tests/test_jpeg.py's gradient roundtrip). A Huffman
    table slip, zigzag error, dequant bug, or IDCT scaling mistake
    breaks the hash match.

    Same Arrow mapInPandas kernel shape as q_multimodal_decode_png; at
    100 TB the payloads come off parquet binary columns instead of
    being synthesized."""
    from ..functions.jpeg import decode_jpeg_gray, encode_jpeg_gray

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [], "width": [], "height": [],
                "mean_px": [], "min_px": [], "max_px": [],
            }
            for doc_id in pdf["doc_id"]:
                w, h = 8 * (2 + doc_id % 3), 8 * (2 + doc_id % 2)
                img = np.zeros((h, w), dtype=np.uint8)
                bi = 0
                for by in range(0, h, 8):
                    for bx in range(0, w, 8):
                        img[by : by + 8, bx : bx + 8] = 2 * (
                            (doc_id * 7 + bi * 13) % 128
                        )
                        bi += 1
                payload = encode_jpeg_gray(img)
                dec = decode_jpeg_gray(payload).astype(np.float64)
                out["doc_id"].append(doc_id)
                out["width"].append(dec.shape[1])
                out["height"].append(dec.shape[0])
                out["mean_px"].append(round(float(dec.mean()), 6))
                out["min_px"].append(int(dec.min()))
                out["max_px"].append(int(dec.max()))
            yield pd.DataFrame(out)

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return docs.repartition(fanout_width(spark)).mapInPandas(
        kernel,
        schema=(
            "doc_id long, width long, height long, "
            "mean_px double, min_px long, max_px long"
        ),
    )


@register(
    "q_multimodal_decode_gif",
    oracle="""
WITH d AS (
  SELECT doc_id, 10 + doc_id % 11 AS w, 6 + doc_id % 7 AS h
  FROM documents),
px AS (
  SELECT doc_id, w, h, unnest(range(w * h)) AS p FROM d),
v AS (
  SELECT doc_id, w, h,
         (doc_id * 3 + p) % 8 AS idx
  FROM px)
SELECT doc_id,
       CAST(w AS BIGINT) AS width,
       CAST(h AS BIGINT) AS height,
       ROUND(AVG((doc_id * 11 + idx * 37) % 256), 6) AS mean_r,
       ROUND(AVG((doc_id * 13 + idx * 41) % 256), 6) AS mean_g,
       CAST(MAX((doc_id * 17 + idx * 43) % 256) AS BIGINT) AS max_b
FROM v GROUP BY doc_id, w, h
""",
)
def q_multimodal_decode_gif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GIF decode end-to-end: per doc, build a deterministic 8-color
    palette + index pattern, container it as a REAL GIF87a file
    (functions/gif.py — true variable-width LZW with table growth and
    the 4096-entry CLEAR reset), decode the compressed bytes back with
    the independent block-walking LZW decoder, and derive channel stats
    from the decoded raster ONLY. GIF is palette-indexed and lossless,
    so the analytic oracle matches exactly with no fixture contract
    (contrast q_multimodal_decode_jpeg's even-constant-block trick). An
    LZW width-bump off-by-one, sub-block framing slip, or KwKwK-case
    bug breaks the hash match.

    Same Arrow mapInPandas kernel shape as the PNG/JPEG twins; at
    100 TB payloads come off parquet binary columns."""
    from ..functions.gif import decode_gif, encode_gif

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [], "width": [], "height": [],
                "mean_r": [], "mean_g": [], "max_b": [],
            }
            for doc_id in pdf["doc_id"]:
                w, h = 10 + doc_id % 11, 6 + doc_id % 7
                pal = np.stack(
                    [
                        (doc_id * 11 + np.arange(8) * 37) % 256,
                        (doc_id * 13 + np.arange(8) * 41) % 256,
                        (doc_id * 17 + np.arange(8) * 43) % 256,
                    ],
                    axis=1,
                ).astype(np.uint8)
                idx = (
                    (doc_id * 3 + np.arange(w * h)) % 8
                ).astype(np.uint8).reshape(h, w)
                payload = encode_gif(idx, pal)
                di, dp = decode_gif(payload)
                rgb = dp[di.reshape(-1)].astype(np.float64)
                out["doc_id"].append(doc_id)
                out["height"].append(di.shape[0])
                out["width"].append(di.shape[1])
                out["mean_r"].append(round(float(rgb[:, 0].mean()), 6))
                out["mean_g"].append(round(float(rgb[:, 1].mean()), 6))
                out["max_b"].append(int(rgb[:, 2].max()))
            yield pd.DataFrame(out)

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return docs.repartition(fanout_width(spark)).mapInPandas(
        kernel,
        schema=(
            "doc_id long, width long, height long, "
            "mean_r double, mean_g double, max_b long"
        ),
    )


_FFT_N = 256  # samples per clip (power of two)
_FFT_RATE = 8000


@register(
    "q_multimodal_audio_fft",
    oracle=f"""
WITH p AS (
  SELECT doc_id,
         3 + doc_id % 100 AS k1,
         3 + doc_id % 100 + 1 + (doc_id * 7) % 20 AS k2
  FROM documents)
SELECT doc_id,
       CAST({_FFT_N} AS BIGINT) AS n_samples,
       CAST(k1 AS BIGINT) AS dominant_bin,
       ROUND(k1 * {_FFT_RATE}.0 / {_FFT_N}, 6) AS dominant_hz,
       CAST(k2 AS BIGINT) AS second_bin,
       ROUND(k2 * {_FFT_RATE}.0 / {_FFT_N}, 6) AS second_hz
FROM p
""",
)
def q_multimodal_audio_fft(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPECTRAL feature extraction through a REAL FFT: per doc,
    synthesize a two-tone PCM16 signal (k1 cycles at amplitude 8000 +
    k2 cycles at 3000 over {_FFT_N} samples), round-trip it through
    the WAV container codec, run numpy's rFFT on the DECODED samples,
    and report the top-two magnitude bins and their frequencies. The
    oracle is pure physics: integer-cycle sinusoids concentrate all
    energy in their own DFT bins (no leakage), so argmax must equal k1
    and the runner-up k2 — a window slip, an off-by-one in the bin
    axis, or a codec corruption moves a peak and breaks the match.
    int16 quantization noise is ~60 dB below the tones, far from
    flipping a bin.

    Scale: the FFT runs inside the same Arrow mapInPandas kernel as
    every decode operator — per-clip O(N log N) CPU, zero extra
    shuffle. At 100 TB this is the spectral-gate pass an audio
    curation pipeline runs between decode and ASR (bandwidth checks,
    tone/DTMF detection, resample validation)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .multimodal import decode_wav_pcm16, encode_wav_pcm16

        out_cols = (
            "doc_id", "n_samples", "dominant_bin", "dominant_hz",
            "second_bin", "second_hz",
        )
        for pdf in batches:
            out = {c: [] for c in out_cols}
            i = np.arange(_FFT_N, dtype=np.float64)
            for doc_id in pdf["doc_id"]:
                k1 = 3 + doc_id % 100
                k2 = k1 + 1 + (doc_id * 7) % 20
                sig = np.rint(
                    8000 * np.sin(2 * np.pi * k1 * i / _FFT_N)
                    + 3000 * np.sin(2 * np.pi * k2 * i / _FFT_N)
                ).astype(np.int64)
                _, dec = decode_wav_pcm16(
                    encode_wav_pcm16(sig, _FFT_RATE)
                )
                mag = np.abs(np.fft.rfft(dec.astype(np.float64)))
                mag[0] = 0.0  # ignore DC
                b1 = int(np.argmax(mag))
                mag[b1] = -1.0
                b2 = int(np.argmax(mag))
                out["doc_id"].append(doc_id)
                out["n_samples"].append(_FFT_N)
                out["dominant_bin"].append(b1)
                out["dominant_hz"].append(
                    round(b1 * _FFT_RATE / _FFT_N, 6)
                )
                out["second_bin"].append(b2)
                out["second_hz"].append(
                    round(b2 * _FFT_RATE / _FFT_N, 6)
                )
            yield pd.DataFrame(out)

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return docs.repartition(fanout_width(spark)).mapInPandas(
        kernel,
        schema=(
            "doc_id long, n_samples long, dominant_bin long, "
            "dominant_hz double, second_bin long, second_hz double"
        ),
    )


@register(
    "q_multimodal_image_resize",
    oracle="""
WITH d AS (
  SELECT doc_id,
         8 + 2 * (doc_id % 5) AS w,
         6 + 2 * (doc_id % 4) AS h
  FROM documents),
op AS (
  SELECT doc_id, w, h, unnest(range((w // 2) * (h // 2))) AS q FROM d),
cell AS (
  SELECT doc_id, w, h,
         2 * (q // (w // 2)) AS r0, 2 * (q % (w // 2)) AS c0
  FROM op),
px AS (
  SELECT doc_id, w, h, r0, c0,
         (r0 + dr) * w + (c0 + dc) AS p
  FROM cell,
       LATERAL (SELECT unnest(range(2)) AS dr),
       LATERAL (SELECT unnest(range(2)) AS dc)),
rz AS (
  SELECT doc_id, w, h, r0, c0,
         SUM((doc_id * 7 + p * 3) % 256) // 4 AS v
  FROM px GROUP BY doc_id, w, h, r0, c0)
SELECT doc_id,
       CAST(w // 2 AS BIGINT) AS out_w,
       CAST(h // 2 AS BIGINT) AS out_h,
       CAST(SUM(v) AS BIGINT) AS sum_px,
       CAST(MAX(v) AS BIGINT) AS max_px,
       CAST(MIN(v) AS BIGINT) AS min_px
FROM rz GROUP BY doc_id, w, h
""",
)
def q_multimodal_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image RESIZE — the remaining verb of the task brief's multimodal
    quartet (decode / feature-extract / resize / frame-sample): per
    doc, rasterize a deterministic gray pattern, round-trip it through
    the REAL PNG codec (all five scanline filters), then 2:1 BOX
    downsample the decoded raster (each output pixel = floor mean of
    its 2x2 source block, pure integer arithmetic) and report exact
    stats of the RESIZED image only. The oracle recomputes every 2x2
    block sum analytically, so a stride slip, block misalignment, or
    decoder corruption breaks the hash match. Box filtering in exact
    ints is the thumbnail/pyramid step an image-curation pipeline runs
    before CLIP-style scoring.

    Scale: same Arrow mapInPandas kernel family as the decode
    operators — per-image O(pixels) work, no extra shuffle; at 100 TB
    the payload column comes off parquet and the resized raster (or
    its stats) is written back alongside."""
    from .multimodal import decode_png, encode_png

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out_cols = ("doc_id", "out_w", "out_h", "sum_px", "max_px", "min_px")
        for pdf in batches:
            out = {c: [] for c in out_cols}
            for doc_id in pdf["doc_id"]:
                w, h = 8 + 2 * (doc_id % 5), 6 + 2 * (doc_id % 4)
                p = np.arange(w * h, dtype=np.int64)
                gray = ((doc_id * 7 + p * 3) % 256).reshape(h, w)
                rgb = np.stack([gray, gray, gray], axis=2).astype(np.uint8)
                dec = decode_png(encode_png(rgb))[:, :, 0].astype(np.int64)
                # 2:1 box downsample in exact integers
                rz = (
                    dec[0::2, 0::2]
                    + dec[0::2, 1::2]
                    + dec[1::2, 0::2]
                    + dec[1::2, 1::2]
                ) // 4
                out["doc_id"].append(doc_id)
                out["out_w"].append(rz.shape[1])
                out["out_h"].append(rz.shape[0])
                out["sum_px"].append(int(rz.sum()))
                out["max_px"].append(int(rz.max()))
                out["min_px"].append(int(rz.min()))
            yield pd.DataFrame(out)

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return docs.repartition(fanout_width(spark)).mapInPandas(
        kernel,
        schema=(
            "doc_id long, out_w long, out_h long, "
            "sum_px long, max_px long, min_px long"
        ),
    )


@register(
    "q_multimodal_decode_jpeg_color",
    oracle="""
WITH d AS (
  SELECT doc_id,
         16 * (1 + doc_id % 3) AS w,
         16 * (1 + doc_id % 2) AS h
  FROM documents),
m AS (
  SELECT doc_id, w, h,
         unnest(range((w // 16) * (h // 16))) AS mi
  FROM d),
yc AS (
  SELECT doc_id, w, h,
         CAST(2 * ((doc_id * 7 + mi * 13) % 128) AS DOUBLE) AS y,
         CAST(17 * (((doc_id * 5 + mi * 11) % 15) - 7) AS DOUBLE) AS cbo,
         CAST(17 * (((doc_id * 3 + mi * 7) % 15) - 7) AS DOUBLE) AS cro
  FROM m),
px AS (
  SELECT doc_id, w, h,
    LEAST(255, GREATEST(0, FLOOR(y + 1.402 * cro + 0.5))) AS r,
    LEAST(255, GREATEST(0,
      FLOOR(y - 0.344136 * cbo - 0.714136 * cro + 0.5))) AS g,
    LEAST(255, GREATEST(0, FLOOR(y + 1.772 * cbo + 0.5))) AS b
  FROM yc)
SELECT doc_id,
       CAST(w AS BIGINT) AS width,
       CAST(h AS BIGINT) AS height,
       ROUND(AVG(r), 6) AS mean_r,
       ROUND(AVG(g), 6) AS mean_g,
       ROUND(AVG(b), 6) AS mean_b,
       CAST(MIN(r) AS BIGINT) AS min_r,
       CAST(MAX(b) AS BIGINT) AS max_b
FROM px GROUP BY doc_id, w, h
""",
)
def q_multimodal_decode_jpeg_color(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """COLOR (4:2:0 YCbCr) JPEG decode end-to-end (VERDICT r5 #2): per
    doc, rasterize a deterministic pattern of constant 16x16 MCU tiles
    directly in YCbCr space, encode it as a REAL baseline 4:2:0 JFIF
    file (functions/jpeg.py — interleaved MCU scan, K.1/K.2 quant,
    K.3-K.6 Huffman tables, per-component DC predictors), then decode
    the compressed bytes back through the independent marker-walking
    decoder — plane reconstruction, 2x chroma upsampling, BT.601
    YCbCr->RGB with half-up rounding — and derive RGB channel stats
    from the decoded raster ONLY.

    Exactness: constant tiles put all energy in each block's DC; luma
    values are even (K.1 DC quantum 16) and chroma offsets are
    multiples of 17 (K.2 DC quantum), so the planes reconstruct
    bit-for-bit, and the color conversion uses FLOOR(x+0.5) rounding
    that ANSI SQL reproduces verbatim — the analytic oracle recomputes
    the expected RGB per tile. A chroma-table swap, MCU-ordering bug,
    DC-predictor mixup, upsampling shift, or conversion-matrix error
    breaks the hash match. Same Arrow mapInPandas kernel shape as the
    gray variant; at 100 TB payloads come off parquet binary columns.
    """
    from ..functions.jpeg import decode_jpeg_color, encode_jpeg_ycbcr420

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [], "width": [], "height": [],
                "mean_r": [], "mean_g": [], "mean_b": [],
                "min_r": [], "max_b": [],
            }
            for doc_id in pdf["doc_id"]:
                w, h = 16 * (1 + doc_id % 3), 16 * (1 + doc_id % 2)
                y = np.zeros((h, w), dtype=np.uint8)
                cb = np.zeros((h // 2, w // 2), dtype=np.uint8)
                cr = np.zeros((h // 2, w // 2), dtype=np.uint8)
                mi = 0
                for my in range(0, h, 16):
                    for mx in range(0, w, 16):
                        y[my : my + 16, mx : mx + 16] = 2 * (
                            (doc_id * 7 + mi * 13) % 128
                        )
                        cb[my // 2 : my // 2 + 8, mx // 2 : mx // 2 + 8] = (
                            128 + 17 * ((doc_id * 5 + mi * 11) % 15 - 7)
                        )
                        cr[my // 2 : my // 2 + 8, mx // 2 : mx // 2 + 8] = (
                            128 + 17 * ((doc_id * 3 + mi * 7) % 15 - 7)
                        )
                        mi += 1
                payload = encode_jpeg_ycbcr420(y, cb, cr)
                rgb = decode_jpeg_color(payload).astype(np.float64)
                out["doc_id"].append(doc_id)
                out["width"].append(rgb.shape[1])
                out["height"].append(rgb.shape[0])
                out["mean_r"].append(round(float(rgb[:, :, 0].mean()), 6))
                out["mean_g"].append(round(float(rgb[:, :, 1].mean()), 6))
                out["mean_b"].append(round(float(rgb[:, :, 2].mean()), 6))
                out["min_r"].append(int(rgb[:, :, 0].min()))
                out["max_b"].append(int(rgb[:, :, 2].max()))
            yield pd.DataFrame(out)

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return docs.repartition(fanout_width(spark)).mapInPandas(
        kernel,
        schema=(
            "doc_id long, width long, height long, "
            "mean_r double, mean_g double, mean_b double, "
            "min_r long, max_b long"
        ),
    )


@register(
    "q_multimodal_video_mjpeg",
    oracle="""
WITH d AS (
  SELECT doc_id,
         16 * (1 + doc_id % 2) AS w,
         16 AS h,
         2 + doc_id % 3 AS nf
  FROM documents),
fr AS (
  SELECT doc_id, w, h, nf, unnest(range(0, nf, 2)) AS f FROM d),
m AS (
  SELECT doc_id, w, h, f, unnest(range(w // 16)) AS mi FROM fr),
yc AS (
  SELECT doc_id, w, h, f,
         CAST(2 * ((doc_id * 7 + f * 19 + mi * 13) % 128) AS DOUBLE) AS y,
         CAST(17 * (((doc_id * 5 + f * 3 + mi * 11) % 15) - 7) AS DOUBLE)
           AS cbo,
         CAST(17 * (((doc_id * 3 + f * 5 + mi * 7) % 15) - 7) AS DOUBLE)
           AS cro
  FROM m),
px AS (
  SELECT doc_id, w, h, f,
    LEAST(255, GREATEST(0, FLOOR(y + 1.402 * cro + 0.5))) AS r,
    LEAST(255, GREATEST(0,
      FLOOR(y - 0.344136 * cbo - 0.714136 * cro + 0.5))) AS g,
    LEAST(255, GREATEST(0, FLOOR(y + 1.772 * cbo + 0.5))) AS b
  FROM yc)
SELECT doc_id,
       CAST(f AS BIGINT) AS frame_idx,
       CAST(w AS BIGINT) AS width,
       CAST(h AS BIGINT) AS height,
       ROUND(AVG(r), 6) AS mean_r,
       ROUND(AVG(g), 6) AS mean_g,
       ROUND(AVG(b), 6) AS mean_b
FROM px GROUP BY doc_id, f, w, h
""",
)
def q_multimodal_video_mjpeg(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """COMPRESSED video decode + frame sampling end-to-end: per doc,
    render 2-4 color frames as constant-MCU-tile YCbCr patterns,
    encode each as a REAL baseline 4:2:0 JPEG, wrap them in a REAL
    AVI/RIFF MJPEG container (functions/avi.py), then decode the
    container back — RIFF walk, strf/MJPG validation, per-frame JPEG
    decode through the independent marker-walking decoder — keep every
    2nd frame, and derive per-frame RGB means from the decoded rasters
    ONLY. Upgrades the video leg from the uncompressed concatenated-PPM
    stream (q_multimodal_video_decode) to the compressed container a
    camera corpus actually ships.

    Exactness: constant tiles + quantum-aligned values reconstruct the
    YCbCr planes bit-for-bit (q_multimodal_decode_jpeg_color contract)
    and FLOOR(x+0.5) conversion is SQL-reproducible, so the oracle
    recomputes sampled-frame stats analytically. A RIFF length slip,
    chunk misalignment (odd-length JPEG payloads exercise the word-
    alignment pad), frame-order bug, or any JPEG-layer error breaks
    the hash match. MJPEG frames are independent, so at 100 TB the
    payloads split at any frame boundary and decode embarrassingly
    parallel inside the Arrow kernel — no shuffle until the tiny stats
    rows."""
    from ..functions.avi import decode_avi_mjpeg, encode_avi_mjpeg
    from ..functions.jpeg import decode_jpeg_color, encode_jpeg_ycbcr420

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [], "frame_idx": [], "width": [], "height": [],
                "mean_r": [], "mean_g": [], "mean_b": [],
            }
            for doc_id in pdf["doc_id"]:
                w, h = 16 * (1 + doc_id % 2), 16
                nf = 2 + doc_id % 3
                jpegs = []
                for f in range(nf):
                    y = np.zeros((h, w), dtype=np.uint8)
                    cb = np.zeros((h // 2, w // 2), dtype=np.uint8)
                    cr = np.zeros((h // 2, w // 2), dtype=np.uint8)
                    for mi in range(w // 16):
                        y[:, mi * 16 : mi * 16 + 16] = 2 * (
                            (doc_id * 7 + f * 19 + mi * 13) % 128
                        )
                        cb[:, mi * 8 : mi * 8 + 8] = 128 + 17 * (
                            (doc_id * 5 + f * 3 + mi * 11) % 15 - 7
                        )
                        cr[:, mi * 8 : mi * 8 + 8] = 128 + 17 * (
                            (doc_id * 3 + f * 5 + mi * 7) % 15 - 7
                        )
                    jpegs.append(encode_jpeg_ycbcr420(y, cb, cr))
                payload = encode_avi_mjpeg(jpegs, w, h)
                aw, ah, frames = decode_avi_mjpeg(payload)
                for idx in range(0, len(frames), 2):
                    rgb = decode_jpeg_color(frames[idx]).astype(np.float64)
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["width"].append(aw)
                    out["height"].append(ah)
                    out["mean_r"].append(round(float(rgb[:, :, 0].mean()), 6))
                    out["mean_g"].append(round(float(rgb[:, :, 1].mean()), 6))
                    out["mean_b"].append(round(float(rgb[:, :, 2].mean()), 6))
            yield pd.DataFrame(out)

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return docs.repartition(fanout_width(spark)).mapInPandas(
        kernel,
        schema=(
            "doc_id long, frame_idx long, width long, height long, "
            "mean_r double, mean_g double, mean_b double"
        ),
    )


@register(
    "q_multimodal_decode_jpeg_progressive",
    oracle="""
WITH d AS (
  SELECT doc_id,
         16 * (1 + doc_id % 2) AS w,
         16 * (1 + doc_id % 3) AS h
  FROM documents),
m AS (
  SELECT doc_id, w, h,
         unnest(range((w // 16) * (h // 16))) AS mi
  FROM d),
yc AS (
  SELECT doc_id, w, h,
         CAST(2 * ((doc_id * 11 + mi * 17) % 128) AS DOUBLE) AS y,
         CAST(17 * (((doc_id * 7 + mi * 5) % 15) - 7) AS DOUBLE) AS cbo,
         CAST(17 * (((doc_id * 13 + mi * 3) % 15) - 7) AS DOUBLE) AS cro
  FROM m),
px AS (
  SELECT doc_id, w, h,
    LEAST(255, GREATEST(0, FLOOR(y + 1.402 * cro + 0.5))) AS r,
    LEAST(255, GREATEST(0,
      FLOOR(y - 0.344136 * cbo - 0.714136 * cro + 0.5))) AS g,
    LEAST(255, GREATEST(0, FLOOR(y + 1.772 * cbo + 0.5))) AS b
  FROM yc)
SELECT doc_id,
       CAST(w AS BIGINT) AS width,
       CAST(h AS BIGINT) AS height,
       ROUND(AVG(r), 6) AS mean_r,
       ROUND(AVG(g), 6) AS mean_g,
       CAST(MIN(b) AS BIGINT) AS min_b,
       CAST(MAX(r) AS BIGINT) AS max_r
FROM px GROUP BY doc_id, w, h
""",
)
def q_multimodal_decode_jpeg_progressive(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PROGRESSIVE (SOF2) color JPEG decode end-to-end: per doc, the
    constant-MCU YCbCr pattern is encoded as a spectral-selection
    progressive file — interleaved DC scan, then three per-component
    AC band scans (functions/jpeg.py encode_jpeg_ycbcr420_progressive)
    — and decoded back through the multi-scan parser + coefficient
    accumulator (_decode_progressive_coefs): per-scan bit streams,
    per-component DC predictors, EOB-run handling, then one IDCT over
    the accumulated coefficients. RGB stats come from the decoded
    raster ONLY; the analytic oracle is exact for the same reason as
    the baseline color query (DC-only blocks, quantum-aligned values,
    SQL-reproducible FLOOR(x+0.5) conversion). A scan-ordering bug,
    band mis-accumulation, non-interleaved raster mixup, or EOB-run
    slip breaks the hash match. Progressive is what web CDNs serve —
    with this the engine decodes baseline gray, baseline 4:2:0 color,
    AND progressive color from the same `decode_media` router."""
    from ..functions.jpeg import (
        decode_jpeg_color,
        encode_jpeg_ycbcr420_progressive,
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [], "width": [], "height": [],
                "mean_r": [], "mean_g": [], "min_b": [], "max_r": [],
            }
            for doc_id in pdf["doc_id"]:
                w, h = 16 * (1 + doc_id % 2), 16 * (1 + doc_id % 3)
                y = np.zeros((h, w), dtype=np.uint8)
                cb = np.zeros((h // 2, w // 2), dtype=np.uint8)
                cr = np.zeros((h // 2, w // 2), dtype=np.uint8)
                mi = 0
                for my in range(0, h, 16):
                    for mx in range(0, w, 16):
                        y[my : my + 16, mx : mx + 16] = 2 * (
                            (doc_id * 11 + mi * 17) % 128
                        )
                        cb[my // 2 : my // 2 + 8, mx // 2 : mx // 2 + 8] = (
                            128 + 17 * ((doc_id * 7 + mi * 5) % 15 - 7)
                        )
                        cr[my // 2 : my // 2 + 8, mx // 2 : mx // 2 + 8] = (
                            128 + 17 * ((doc_id * 13 + mi * 3) % 15 - 7)
                        )
                        mi += 1
                payload = encode_jpeg_ycbcr420_progressive(y, cb, cr)
                rgb = decode_jpeg_color(payload).astype(np.float64)
                out["doc_id"].append(doc_id)
                out["width"].append(rgb.shape[1])
                out["height"].append(rgb.shape[0])
                out["mean_r"].append(round(float(rgb[:, :, 0].mean()), 6))
                out["mean_g"].append(round(float(rgb[:, :, 1].mean()), 6))
                out["min_b"].append(int(rgb[:, :, 2].min()))
                out["max_r"].append(int(rgb[:, :, 0].max()))
            yield pd.DataFrame(out)

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return docs.repartition(fanout_width(spark)).mapInPandas(
        kernel,
        schema=(
            "doc_id long, width long, height long, "
            "mean_r double, mean_g double, min_b long, max_r long"
        ),
    )


@register(
    "q_multimodal_audio_adpcm",
    oracle="""
WITH d AS (
  SELECT doc_id, 3 + doc_id % 3 AS nb FROM documents),
b AS (
  SELECT doc_id, nb, unnest(range(nb)) AS blk FROM d),
v AS (
  SELECT doc_id, nb,
         ((doc_id * 31 + blk * 17) % 2001) - 1000 AS val
  FROM b)
SELECT doc_id,
       CAST(nb * 33 AS BIGINT) AS n_samples,
       ROUND(AVG(val), 6) AS mean_amp,
       CAST(MIN(val) AS BIGINT) AS min_amp,
       CAST(MAX(val) AS BIGINT) AS max_amp
FROM v GROUP BY doc_id, nb
""",
)
def q_multimodal_audio_adpcm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPRESSED audio decode end-to-end: per doc, a block-constant
    PCM16 signal (3-5 blocks of 33 samples) is encoded as a REAL IMA
    ADPCM WAV (fmt tag 0x0011, 4 bits/sample — functions/adpcm.py),
    decoded back through the independent chunk-walking nibble decoder,
    and amplitude stats are derived from the DECODED samples only.

    Exactness: each block header stores its first sample verbatim and
    nibble 0 at step index 0 reconstructs diff 0 exactly, so
    block-constant signals survive the 4x compression bit-for-bit —
    the analytic oracle recomputes the stats from the signal formula.
    A step-table slip, index-walk bug, nibble-order swap, or block
    framing error breaks the hash match (the codec stays fully
    general; the lossy path's error bound is tested separately).
    Blocks are self-contained, so at 100 TB payloads split at any
    block boundary — same frame-independence as MJPEG."""
    from ..functions.adpcm import decode_wav_adpcm, encode_wav_adpcm

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [], "n_samples": [], "mean_amp": [],
                "min_amp": [], "max_amp": [],
            }
            for doc_id in pdf["doc_id"]:
                nb = 3 + doc_id % 3
                vals = np.array(
                    [((doc_id * 31 + b * 17) % 2001) - 1000
                     for b in range(nb)],
                    dtype=np.int16,
                )
                sig = np.repeat(vals, 33)
                payload = encode_wav_adpcm(sig, 8000, 33)
                _, dec = decode_wav_adpcm(payload)
                a = dec.astype(np.float64)
                out["doc_id"].append(doc_id)
                out["n_samples"].append(len(dec))
                out["mean_amp"].append(round(float(a.mean()), 6))
                out["min_amp"].append(int(a.min()))
                out["max_amp"].append(int(a.max()))
            yield pd.DataFrame(out)

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return docs.repartition(fanout_width(spark)).mapInPandas(
        kernel,
        schema=(
            "doc_id long, n_samples long, mean_amp double, "
            "min_amp long, max_amp long"
        ),
    )


@register(
    "q_multimodal_audio_flac",
    oracle="""
WITH d AS (
  SELECT doc_id, 120 + (doc_id % 5) * 37 AS n FROM documents),
s AS (
  SELECT doc_id, n, unnest(range(n)) AS i FROM d),
v AS (
  SELECT doc_id, n,
         ((doc_id * 31 + i * 17) % 2001) - 1000 AS val
  FROM s)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_samples,
       ROUND(AVG(val), 6) AS mean_amp,
       CAST(MIN(val) AS BIGINT) AS min_amp,
       CAST(MAX(val) AS BIGINT) AS max_amp
FROM v GROUP BY doc_id, n
""",
)
def q_multimodal_audio_flac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOSSLESS compressed audio end-to-end (VERDICT r6 #4's
    compressed-audio gap, closed with the spec-computable format): per
    doc, an arbitrary (NOT block-constant — FLAC is lossless) PCM16
    signal is encoded as a real FLAC stream (functions/flac.py: fixed
    predictors + Rice residuals, CRC-8/CRC-16/MD5 layers), decoded
    back through the independent subset decoder, and amplitude stats
    come from the DECODED samples only. block_size=64 forces multiple
    frames plus a short tail frame per payload.

    Exactness is the format's own guarantee: any predictor, Rice,
    framing, or CRC bug breaks the bit-exact reconstruction (decode
    verifies MD5 loudly), so the analytic oracle recomputes stats
    straight from the signal formula. mp3-class perceptual codecs
    remain out of scope — their normative Huffman/window DATA tables
    are not derivable from the spec's algorithms (COVERAGE.md note).
    Frames are self-contained: at 100 TB payloads shard at frame
    boundaries exactly like the MJPEG/ADPCM paths."""
    from ..functions.flac import decode_flac, encode_flac

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [], "n_samples": [], "mean_amp": [],
                "min_amp": [], "max_amp": [],
            }
            for doc_id in pdf["doc_id"]:
                n = 120 + (doc_id % 5) * 37
                i = np.arange(n, dtype=np.int64)
                sig = (((doc_id * 31 + i * 17) % 2001) - 1000).astype(
                    np.int16
                )
                payload = encode_flac(sig, 8000, block_size=64)
                _, dec = decode_flac(payload)
                a = dec.astype(np.float64)
                out["doc_id"].append(doc_id)
                out["n_samples"].append(len(dec))
                out["mean_amp"].append(round(float(a.mean()), 6))
                out["min_amp"].append(int(a.min()))
                out["max_amp"].append(int(a.max()))
            yield pd.DataFrame(out)

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return docs.repartition(fanout_width(spark)).mapInPandas(
        kernel,
        schema=(
            "doc_id long, n_samples long, mean_amp double, "
            "min_amp long, max_amp long"
        ),
    )
