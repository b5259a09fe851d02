"""FLAC codec subset (functions/flac.py): lossless roundtrip across
subframe/stereo modes, decoder-only paths (LPC, multi-partition Rice,
escapes, wasted bits) via hand-built frames through the real
header/CRC plumbing, and loud integrity failures."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from nosql_triple_store_spark.functions import flac
from nosql_triple_store_spark.functions.flac import (
    _BitReader,
    _BitWriter,
    _read_utf8_number,
    _utf8_number,
    _write_residual,
    decode_flac,
    encode_flac,
)


def _ramp(n, seed=7):
    rng = np.random.default_rng(seed)
    return (np.cumsum(rng.integers(-50, 51, n)) % 3000 - 1500).astype(np.int16)


def test_mono_roundtrip_multi_frame_short_tail():
    sig = _ramp(1000)
    sr, back = decode_flac(encode_flac(sig, 8000, block_size=256))
    assert sr == 8000
    assert np.array_equal(back, sig)


@pytest.mark.parametrize("mode", ["independent", "left-side", "mid-side"])
def test_stereo_roundtrip_all_decorrelations(mode):
    sig = _ramp(700)
    st2 = np.stack([sig, sig[::-1] // 2], axis=1).astype(np.int16)
    sr, back = decode_flac(encode_flac(st2, 44100, 192, stereo_mode=mode))
    assert sr == 44100
    assert np.array_equal(back, st2.astype(np.int32))


def test_constant_and_verbatim_paths():
    c = np.full(500, -1234, dtype=np.int16)
    assert np.array_equal(decode_flac(encode_flac(c, 8000))[1], c)
    noise = np.random.default_rng(3).integers(-32768, 32768, 300).astype(
        np.int16
    )
    assert np.array_equal(decode_flac(encode_flac(noise, 8000, 128))[1], noise)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.integers(-32768, 32767), min_size=1, max_size=400),
    st.sampled_from([64, 192, 4096]),
)
def test_roundtrip_property(vals, bs):
    sig = np.array(vals, dtype=np.int16)
    sr, back = decode_flac(encode_flac(sig, 8000, bs))
    assert np.array_equal(back, sig)


def test_utf8_frame_numbers():
    for n in [0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x10000,
              0x1FFFFF, 0x3FFFFFF, 0x7FFFFFFF, (1 << 36) - 1]:
        br = _BitReader(_utf8_number(n))
        assert _read_utf8_number(br) == n


def test_lpc_subframe_decodes(monkeypatch):
    """Decoder-only path: an LPC subframe (order 2, coefs [2,-1],
    shift 0) emitted through the real frame plumbing must reconstruct
    exactly — those coefficients make LPC == FIXED order 2."""
    sig = _ramp(300, seed=11)

    def lpc_writer(bw, s, bps):
        s64 = s.astype(np.int64)
        bw.write(0, 1)
        bw.write(0b100001, 6)  # LPC order 2
        bw.write(0, 1)  # no wasted bits
        for v in s64[:2]:
            bw.write(int(v), bps)
        bw.write(4, 4)  # precision 5
        bw.write(0, 5)  # shift 0
        bw.write(2, 5)  # coef 2
        bw.write(-1, 5)  # coef -1
        res = s64[2:] - (2 * s64[1:-1] - s64[:-2])
        _write_residual(bw, res)

    monkeypatch.setattr(flac, "_encode_subframe", lpc_writer)
    payload = encode_flac(sig, 8000, 300)
    monkeypatch.undo()
    assert np.array_equal(decode_flac(payload)[1], sig)


def test_multi_partition_and_escape_residual(monkeypatch):
    """Decoder-only path: partition order 2 with one raw-bits-escaped
    partition, through the real plumbing."""
    sig = _ramp(256, seed=13)

    def writer(bw, s, bps):
        s64 = s.astype(np.int64)
        bw.write(0, 1)
        bw.write(0b001001, 6)  # FIXED order 1
        bw.write(0, 1)
        bw.write(int(s64[0]), bps)
        res = np.diff(s64)
        bw.write(0, 2)  # 4-bit Rice method
        bw.write(2, 4)  # partition order 2 -> 4 partitions
        n = len(s64)
        pos = 0
        for p in range(4):
            cnt = n // 4 - (1 if p == 0 else 0)
            part = res[pos : pos + cnt]
            if p == 1:  # escaped partition
                bw.write(15, 4)
                bw.write(12, 5)
                for v in part:
                    bw.write(int(v), 12)
            else:
                bw.write(6, 4)
                for v in part:
                    u = (int(v) << 1) ^ (int(v) >> 63)
                    bw.write_unary(u >> 6)
                    bw.write(u, 6)
            pos += cnt

    monkeypatch.setattr(flac, "_encode_subframe", writer)
    payload = encode_flac(sig, 8000, 256)
    monkeypatch.undo()
    assert np.array_equal(decode_flac(payload)[1], sig)


def test_wasted_bits_subframe(monkeypatch):
    """Decoder-only path: 2 wasted bits (samples all multiples of 4)."""
    sig = (np.arange(-100, 100, dtype=np.int16) * 4).astype(np.int16)

    def writer(bw, s, bps):
        s64 = s.astype(np.int64) >> 2
        bw.write(0, 1)
        bw.write(0b001001, 6)  # FIXED order 1
        bw.write(1, 1)  # wasted-bits flag
        bw.write_unary(1)  # wasted = 1 + 1 = 2
        bw.write(int(s64[0]), bps - 2)
        _write_residual(bw, np.diff(s64))

    monkeypatch.setattr(flac, "_encode_subframe", writer)
    payload = encode_flac(sig, 8000, len(sig))
    monkeypatch.undo()
    assert np.array_equal(decode_flac(payload)[1], sig)


def test_integrity_failures_are_loud():
    sig = _ramp(600)
    good = encode_flac(sig, 8000, 256)
    with pytest.raises(ValueError, match="magic"):
        decode_flac(b"RIFF" + good[4:])
    p = bytearray(good)
    p[300] ^= 0xFF  # inside a frame
    with pytest.raises(ValueError):
        decode_flac(bytes(p))
    with pytest.raises(ValueError):
        decode_flac(good[:150])
    # header corruption: flip a bit in the first frame header byte
    # region (after 4 magic + 38 streaminfo) -> sync or CRC-8 error
    p = bytearray(good)
    p[45] ^= 0x01
    with pytest.raises(ValueError):
        decode_flac(bytes(p))


def test_compresses_real_signal():
    sig = _ramp(4096)
    payload = encode_flac(sig, 8000, 4096)
    assert len(payload) < 2 * len(sig) * 0.7  # beats PCM by >30%
