"""Unit tests for the pure-numpy WAV/PPM codecs behind
q_multimodal_decode / q_multimodal_decode_image — including container
variants the fixture queries never produce (extra RIFF chunks, PPM
comments), so the decoders are spec-robust, not synthesis-shaped."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from nosql_triple_store_spark.operators.multimodal import (
    decode_media,
    decode_png,
    decode_ppm,
    decode_ppm_stream,
    decode_wav_pcm16,
    encode_png,
    encode_ppm,
    encode_wav_pcm16,
)


def test_wav_roundtrip():
    sig = np.array([0, 1, -1, 32767, -32768, 123], dtype=np.int64)
    rate, dec = decode_wav_pcm16(encode_wav_pcm16(sig, 44100))
    assert rate == 44100
    np.testing.assert_array_equal(dec, sig.astype(np.int16))


def test_wav_decoder_walks_extra_chunks():
    """A LIST/INFO metadata chunk before data must not break decoding —
    the decoder walks chunks, it doesn't assume a 44-byte header."""
    sig = np.arange(-5, 6, dtype=np.int64)
    payload = encode_wav_pcm16(sig, 8000)
    # splice an odd-sized LIST chunk between fmt and data (tests the
    # word-alignment padding rule too)
    fmt_end = payload.index(b"data")
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = payload[:fmt_end] + extra + payload[fmt_end:]
    rate, dec = decode_wav_pcm16(spliced)
    assert rate == 8000
    np.testing.assert_array_equal(dec, sig.astype(np.int16))


def test_wav_rejects_non_riff_and_stereo():
    with pytest.raises(ValueError):
        decode_wav_pcm16(b"OggS" + b"\x00" * 40)
    stereo_fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    payload = (
        b"RIFF" + struct.pack("<I", 24) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + stereo_fmt
    )
    with pytest.raises(ValueError):
        decode_wav_pcm16(payload)


def test_ppm_roundtrip():
    rgb = (np.arange(2 * 3 * 3) % 256).astype(np.uint8).reshape(2, 3, 3)
    np.testing.assert_array_equal(decode_ppm(encode_ppm(rgb)), rgb)


def test_ppm_decoder_handles_comments_and_whitespace():
    rgb = np.full((2, 2, 3), 7, dtype=np.uint8)
    payload = b"P6\n# a comment line\n 2\t2\n# another\n255\n" + rgb.tobytes()
    np.testing.assert_array_equal(decode_ppm(payload), rgb)


def test_ppm_rejects_wrong_magic_and_depth():
    with pytest.raises(ValueError):
        decode_ppm(b"P5\n2 2\n255\n" + b"\x00" * 4)
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n1 1\n65535\n" + b"\x00" * 6)


def test_png_roundtrip_all_filters():
    # h >= 5 cycles every filter type (encoder uses row % 5); shapes
    # cover 1-pixel rows/cols and non-square rasters
    rng = np.random.default_rng(7)
    for h, w in [(1, 1), (5, 3), (13, 11), (8, 16), (6, 1)]:
        rgb = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
        np.testing.assert_array_equal(decode_png(encode_png(rgb)), rgb)


def test_png_byte_exact_fixture():
    # hand-constructed 2x1 RGB PNG (filter 0) — catches a symmetric
    # encoder+decoder bug (e.g. both swapping width/height) that a
    # round-trip alone cannot see
    import zlib as _zlib

    def chunk(ctype, body):
        crc = _zlib.crc32(ctype + body) & 0xFFFFFFFF
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", crc)
        )

    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 2, 0, 0, 0)  # w=2 h=1 RGB8
    scan = b"\x00" + bytes([10, 20, 30, 40, 50, 60])  # filter 0 + 2 px
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", _zlib.compress(scan))
        + chunk(b"IEND", b"")
    )
    want = np.array([[[10, 20, 30], [40, 50, 60]]], dtype=np.uint8)
    np.testing.assert_array_equal(decode_png(payload), want)


def test_png_rejects_bad_crc_and_unsupported():
    rgb = np.full((3, 3, 3), 9, dtype=np.uint8)
    good = bytearray(encode_png(rgb))
    good[-5] ^= 0xFF  # corrupt IEND CRC
    with pytest.raises(ValueError):
        decode_png(bytes(good))
    with pytest.raises(ValueError):
        decode_png(b"GIF89a not a png")
    # grayscale IHDR must be rejected, not mis-decoded
    import zlib as _zlib

    def chunk(ctype, body):
        crc = _zlib.crc32(ctype + body) & 0xFFFFFFFF
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", crc)
        )

    gray = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", _zlib.compress(b"\x00\x07"))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        decode_png(gray)


def test_decode_media_dispatch():
    sig = np.array([1, 2, 3], dtype=np.int64)
    rate, dec = decode_media(encode_wav_pcm16(sig, 8000), "wav")
    assert rate == 8000 and len(dec) == 3
    rgb = np.zeros((1, 1, 3), dtype=np.uint8)
    assert decode_media(encode_ppm(rgb), "ppm").shape == (1, 1, 3)
    assert decode_media(encode_png(rgb), "png").shape == (1, 1, 3)
    from nosql_triple_store_spark.functions.jpeg import encode_jpeg_gray

    gray8 = np.full((8, 8), 100, dtype=np.uint8)
    assert np.array_equal(
        decode_media(encode_jpeg_gray(gray8), "jpg"), gray8
    )
    with pytest.raises(NotImplementedError):
        decode_media(b"\x00\x01", "mp3")


def test_ppm_stream_roundtrip_mixed_sizes():
    rng = np.random.default_rng(7)
    frames = [
        rng.integers(0, 256, size=(3, 5, 3), dtype=np.uint8),
        rng.integers(0, 256, size=(1, 1, 3), dtype=np.uint8),
        rng.integers(0, 256, size=(4, 2, 3), dtype=np.uint8),
    ]
    stream = b"".join(encode_ppm(f) for f in frames)
    dec = decode_ppm_stream(stream)
    assert len(dec) == 3
    for a, b in zip(frames, dec):
        assert np.array_equal(a, b)


def test_ppm_stream_empty_and_errors():
    assert decode_ppm_stream(b"") == []
    one = encode_ppm(np.zeros((2, 2, 3), dtype=np.uint8))
    with pytest.raises(ValueError, match="bad frame magic"):
        decode_ppm_stream(one + b"JUNK")
    with pytest.raises(ValueError, match="truncated raster"):
        decode_ppm_stream(one[:-1])


def test_decode_media_routes_color_jpeg():
    import numpy as np

    from nosql_triple_store_spark.functions.jpeg import encode_jpeg_ycbcr420
    from nosql_triple_store_spark.operators.multimodal import decode_media

    y = np.full((16, 16), 100, dtype=np.uint8)
    cb = np.full((8, 8), 128 + 34, dtype=np.uint8)
    cr = np.full((8, 8), 128 - 17, dtype=np.uint8)
    rgb = decode_media(encode_jpeg_ycbcr420(y, cb, cr), "jpg")
    assert rgb.shape == (16, 16, 3)
    # constant tile -> exact reconstruction -> known conversion output
    exp_r = int(np.floor(100 + 1.402 * -17 + 0.5))
    exp_b = int(np.floor(100 + 1.772 * 34 + 0.5))
    assert (rgb[:, :, 0] == exp_r).all()
    assert (rgb[:, :, 2] == exp_b).all()


def test_decode_media_routes_flac():
    import numpy as np

    from nosql_triple_store_spark.functions.flac import encode_flac
    from nosql_triple_store_spark.operators.multimodal import decode_media

    sig = (np.arange(400) % 2000 - 1000).astype(np.int16)
    assert np.array_equal(decode_media(encode_flac(sig, 8000, 128), "flac"), sig)


def test_decode_media_scope_rationale_is_loud():
    import pytest

    from nosql_triple_store_spark.operators.multimodal import decode_media

    with pytest.raises(NotImplementedError, match="mp3"):
        decode_media(b"\xff\xfb\x90\x00" + b"\x00" * 100, "mp3")
