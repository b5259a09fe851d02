"""Baseline JPEG codec unit tests (functions/jpeg.py): container
validity, exactness on the even-constant-block contract the analytic
oracle relies on, lossy-path error bounds, and loud rejection of the
modes the decoder does not implement."""

from __future__ import annotations

import numpy as np
import pytest

from nosql_triple_store_spark.functions.jpeg import (
    ZIGZAG,
    decode_jpeg_gray,
    encode_jpeg_gray,
)


def _block_image(doc_id: int, w: int = 24, h: int = 16) -> np.ndarray:
    img = np.zeros((h, w), dtype=np.uint8)
    bi = 0
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            img[by : by + 8, bx : bx + 8] = 2 * ((doc_id * 7 + bi * 13) % 128)
            bi += 1
    return img


def test_zigzag_is_a_permutation_with_known_anchors():
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    # first diagonal walk per T.81 figure 5: 0, (0,1), (1,0), (2,0)...
    assert ZIGZAG[:6].tolist() == [0, 1, 8, 16, 9, 2]
    assert ZIGZAG[-1] == 63


def test_container_markers():
    payload = encode_jpeg_gray(_block_image(3))
    assert payload[:2] == b"\xff\xd8"  # SOI
    assert payload[-2:] == b"\xff\xd9"  # EOI
    assert b"JFIF\x00" in payload[:20]


def test_even_constant_blocks_roundtrip_exactly():
    for doc_id in (0, 1, 7, 42, 511):
        img = _block_image(doc_id)
        dec = decode_jpeg_gray(encode_jpeg_gray(img))
        assert np.array_equal(dec, img), f"doc {doc_id} not exact"


def test_smooth_gradient_error_bounded():
    x = np.linspace(0, 255, 64)
    grad = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
    dec = decode_jpeg_gray(encode_jpeg_gray(grad))
    err = np.abs(dec.astype(int) - grad.astype(int)).max()
    assert err <= 8, f"gradient max error {err}"


def test_dc_prediction_across_many_blocks():
    # monotone block staircase exercises long positive and negative DC
    # diffs and multi-category Huffman codes
    img = np.zeros((8, 8 * 16), dtype=np.uint8)
    for bi in range(16):
        img[:, bi * 8 : bi * 8 + 8] = (bi * 16) % 256
    dec = decode_jpeg_gray(encode_jpeg_gray(img))
    assert np.array_equal(dec, img)  # even values -> exact


def test_rejects_non_multiple_of_8():
    with pytest.raises(ValueError):
        encode_jpeg_gray(np.zeros((10, 16), dtype=np.uint8))


def test_rejects_non_jpeg_and_progressive():
    with pytest.raises(ValueError):
        decode_jpeg_gray(b"\x89PNG\r\n\x1a\n")
    payload = bytearray(encode_jpeg_gray(_block_image(1)))
    sof = payload.find(b"\xff\xc0")
    payload[sof + 1] = 0xC2  # flip SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError):
        decode_jpeg_gray(bytes(payload))


def test_decode_media_routes_jpeg():
    from nosql_triple_store_spark.operators.multimodal import decode_media

    img = _block_image(9)
    assert np.array_equal(
        decode_media(encode_jpeg_gray(img), "jpg"), img
    )
