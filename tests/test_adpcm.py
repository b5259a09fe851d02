"""IMA ADPCM codec (functions/adpcm.py): block-constant exactness,
partial final block, lossy error bound, loud rejections."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from nosql_triple_store_spark.functions.adpcm import (
    INDEX_TABLE,
    STEP_TABLE,
    decode_wav_adpcm,
    encode_wav_adpcm,
)


def test_tables_are_spec_shaped():
    assert len(STEP_TABLE) == 89
    assert STEP_TABLE[0] == 7 and STEP_TABLE[-1] == 32767
    assert all(a < b for a, b in zip(STEP_TABLE, STEP_TABLE[1:]))
    assert INDEX_TABLE == [-1, -1, -1, -1, 2, 4, 6, 8]


def test_block_constant_roundtrip_exact():
    spb = 33
    vals = np.array(
        [((9 * 31 + b * 17) % 2001) - 1000 for b in range(6)],
        dtype=np.int16,
    )
    sig = np.repeat(vals, spb)
    rate, back = decode_wav_adpcm(encode_wav_adpcm(sig, 8000, spb))
    assert rate == 8000
    assert np.array_equal(back, sig)


def test_partial_final_block_exact():
    spb = 33
    sig = np.repeat(
        np.array([100, -200, 300], dtype=np.int16), spb
    )[: 2 * spb + 7]
    _, back = decode_wav_adpcm(encode_wav_adpcm(sig, 8000, spb))
    assert np.array_equal(back, sig)


def test_lossy_sine_error_bounded():
    t = np.arange(3000)
    sine = (4000 * np.sin(t / 7)).astype(np.int16)
    _, back = decode_wav_adpcm(encode_wav_adpcm(sine, 8000))
    # adaptation error stays well under the signal swing; 4x
    # compression is lossy but tracks
    assert np.abs(back.astype(int) - sine.astype(int)).max() < 2500
    assert len(back) == len(sine)


def test_rejections():
    sig = np.zeros(40, dtype=np.int16)
    with pytest.raises(ValueError, match="mod 8"):
        encode_wav_adpcm(sig, 8000, samples_per_block=10)
    with pytest.raises(ValueError, match="empty"):
        encode_wav_adpcm(np.array([], dtype=np.int16), 8000)
    with pytest.raises(ValueError, match="not a RIFF"):
        decode_wav_adpcm(b"\x00" * 16)
    from nosql_triple_store_spark.operators.multimodal import (
        encode_wav_pcm16,
    )

    with pytest.raises(ValueError, match="0x0001"):
        decode_wav_adpcm(encode_wav_pcm16(sig, 8000))
    good = bytearray(encode_wav_adpcm(np.ones(33, dtype=np.int16), 8000, 33))
    # corrupt the stored step index beyond 88
    i = good.index(b"data") + 8 + 2
    good[i] = 99
    with pytest.raises(ValueError, match="out of range"):
        decode_wav_adpcm(bytes(good))
