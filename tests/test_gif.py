"""GIF87a codec unit tests (functions/gif.py): lossless roundtrips
across palette sizes, the LZW 4096-entry table reset, the KwKwK
decoder case, container markers, and loud rejection of unsupported
GIF features."""

from __future__ import annotations

import numpy as np
import pytest

from nosql_triple_store_spark.functions.gif import (
    _lzw_compress,
    _lzw_decompress,
    decode_gif,
    encode_gif,
)


def test_roundtrip_palette_sizes():
    rs = np.random.RandomState(1)
    for n_colors, shape in ((2, (5, 7)), (16, (32, 32)), (256, (40, 25)),
                            (5, (1, 1))):
        pal = rs.randint(0, 256, (n_colors, 3)).astype(np.uint8)
        idx = rs.randint(0, n_colors, shape).astype(np.uint8)
        di, dp = decode_gif(encode_gif(idx, pal))
        assert np.array_equal(di, idx), (n_colors, shape)
        assert np.array_equal(dp[:n_colors], pal)


def test_lzw_table_reset_past_4096_codes():
    rs = np.random.RandomState(2)
    idx = rs.randint(0, 256, (128, 128)).astype(np.uint8)
    pal = rs.randint(0, 256, (256, 3)).astype(np.uint8)
    di, _ = decode_gif(encode_gif(idx, pal))
    assert np.array_equal(di, idx)


def test_kwkwk_case():
    # "abababab..." forces the code==len(table) branch immediately
    seq = np.tile(np.array([0, 1], dtype=np.uint8), 50)
    lzw = _lzw_compress(seq, 2)
    assert _lzw_decompress(lzw, 2, len(seq)) == seq.tobytes()


def test_container_markers():
    pal = np.zeros((4, 3), dtype=np.uint8)
    idx = np.zeros((3, 3), dtype=np.uint8)
    g = encode_gif(idx, pal)
    assert g[:6] == b"GIF87a"
    assert g[-1] == 0x3B  # trailer
    assert b"\x2c" in g  # image descriptor


def test_rejections():
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ValueError, match="palette size"):
        encode_gif(np.zeros((2, 2), dtype=np.uint8),
                   np.zeros((1, 3), dtype=np.uint8))
    g = bytearray(encode_gif(np.zeros((2, 2), dtype=np.uint8),
                             np.zeros((4, 3), dtype=np.uint8)))
    # flip the interlace bit in the image descriptor's packed byte
    desc = g.index(0x2C, 6)
    g[desc + 9] |= 0x40
    with pytest.raises(ValueError, match="interlaced"):
        decode_gif(bytes(g))


def test_decode_media_routes_gif():
    from nosql_triple_store_spark.operators.multimodal import decode_media

    pal = np.array([[1, 2, 3], [4, 5, 6]], dtype=np.uint8)
    idx = np.array([[0, 1], [1, 0]], dtype=np.uint8)
    di, dp = decode_media(encode_gif(idx, pal), "gif")
    assert np.array_equal(di, idx) and np.array_equal(dp[:2], pal)
