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


def _color_planes(seed: int, h: int = 32, w: int = 48):
    y = np.zeros((h, w), dtype=np.uint8)
    cb = np.zeros((h // 2, w // 2), dtype=np.uint8)
    cr = np.zeros((h // 2, w // 2), dtype=np.uint8)
    mi = 0
    for my in range(0, h, 16):
        for mx in range(0, w, 16):
            y[my : my + 16, mx : mx + 16] = 2 * ((seed * 7 + mi * 13) % 128)
            cb[my // 2 : my // 2 + 8, mx // 2 : mx // 2 + 8] = 128 + 17 * (
                (seed * 5 + mi * 11) % 15 - 7
            )
            cr[my // 2 : my // 2 + 8, mx // 2 : mx // 2 + 8] = 128 + 17 * (
                (seed * 3 + mi * 7) % 15 - 7
            )
            mi += 1
    return y, cb, cr


def test_color_constant_mcu_planes_exact():
    from nosql_triple_store_spark.functions.jpeg import (
        decode_jpeg_ycbcr420,
        encode_jpeg_ycbcr420,
    )

    for seed in (0, 3, 11):
        y, cb, cr = _color_planes(seed)
        y2, cb2, cr2 = decode_jpeg_ycbcr420(encode_jpeg_ycbcr420(y, cb, cr))
        assert np.array_equal(y2, y)
        assert np.array_equal(cb2, cb)
        assert np.array_equal(cr2, cr)


def test_color_lossy_gradient_bounded_error():
    from nosql_triple_store_spark.functions.jpeg import (
        decode_jpeg_color,
        encode_jpeg_ycbcr420,
        rgb_to_ycbcr420,
    )

    h, w = 32, 32
    rgb = np.linspace(0, 255, h * w * 3).reshape(h, w, 3).astype(np.uint8)
    y, cb, cr = rgb_to_ycbcr420(rgb)
    dec = decode_jpeg_color(encode_jpeg_ycbcr420(y, cb, cr))
    assert dec.shape == (h, w, 3)
    # smooth gradient through quantize + 4:2:0 + rounding: small error
    assert np.abs(dec.astype(int) - rgb.astype(int)).max() <= 8


def test_color_rejects_bad_inputs():
    from nosql_triple_store_spark.functions.jpeg import (
        decode_jpeg_color,
        decode_jpeg_gray,
        encode_jpeg_ycbcr420,
    )

    y, cb, cr = _color_planes(1)
    with pytest.raises(ValueError):
        encode_jpeg_ycbcr420(y[:24], cb, cr)  # not multiple of 16
    with pytest.raises(ValueError):
        encode_jpeg_ycbcr420(y, cb[:4], cr)  # wrong chroma shape
    payload = encode_jpeg_ycbcr420(y, cb, cr)
    with pytest.raises(ValueError):
        decode_jpeg_gray(payload)  # gray decoder rejects color scan
    with pytest.raises(ValueError):
        decode_jpeg_color(encode_jpeg_gray(_block_image(2)))


def test_error_paths_raise_valueerror_not_internal():
    # ADVICE r5: SOS-before-SOF0, missing DQT/DHT, truncated entropy
    # data must raise ValueError (not NameError/KeyError/IndexError)
    from nosql_triple_store_spark.functions.jpeg import decode_jpeg_color

    y, cb, cr = _color_planes(5)
    from nosql_triple_store_spark.functions.jpeg import encode_jpeg_ycbcr420

    payload = bytearray(encode_jpeg_ycbcr420(y, cb, cr))
    # drop SOF0
    sof = payload.find(b"\xff\xc0")
    ln = int.from_bytes(payload[sof + 2 : sof + 4], "big")
    no_sof = bytes(payload[:sof]) + bytes(payload[sof + 2 + ln :])
    with pytest.raises(ValueError, match="SOS before SOF0"):
        decode_jpeg_color(no_sof)
    # drop every DHT
    out = bytearray(payload)
    while (i := out.find(b"\xff\xc4")) >= 0:
        ln = int.from_bytes(out[i + 2 : i + 4], "big")
        del out[i : i + 2 + ln]
    with pytest.raises(ValueError, match="missing DC Huffman"):
        decode_jpeg_color(bytes(out))
    # truncate inside the entropy-coded segment
    sos = payload.find(b"\xff\xda")
    with pytest.raises(ValueError):
        decode_jpeg_color(bytes(payload[: sos + 40]))


def test_progressive_gray_exact_and_equals_baseline():
    from nosql_triple_store_spark.functions.jpeg import (
        decode_jpeg_gray,
        encode_jpeg_gray,
        encode_jpeg_gray_progressive,
    )

    img = _block_image(7)
    assert np.array_equal(
        decode_jpeg_gray(encode_jpeg_gray_progressive(img)), img
    )
    # same quantizer => progressive reconstruction == baseline's,
    # even on a lossy gradient
    grad = np.linspace(0, 255, 16 * 24).reshape(16, 24).astype(np.uint8)
    assert np.array_equal(
        decode_jpeg_gray(encode_jpeg_gray_progressive(grad)),
        decode_jpeg_gray(encode_jpeg_gray(grad)),
    )


def test_progressive_color_planes_exact_and_equals_baseline():
    from nosql_triple_store_spark.functions.jpeg import (
        decode_jpeg_color,
        decode_jpeg_ycbcr420,
        encode_jpeg_ycbcr420,
        encode_jpeg_ycbcr420_progressive,
        rgb_to_ycbcr420,
    )

    y, cb, cr = _color_planes(4)
    y2, cb2, cr2 = decode_jpeg_ycbcr420(
        encode_jpeg_ycbcr420_progressive(y, cb, cr)
    )
    assert np.array_equal(y2, y)
    assert np.array_equal(cb2, cb)
    assert np.array_equal(cr2, cr)
    h, w = 32, 32
    rgb = np.linspace(0, 255, h * w * 3).reshape(h, w, 3).astype(np.uint8)
    yy, cc, rr = rgb_to_ycbcr420(rgb)
    assert np.array_equal(
        decode_jpeg_color(encode_jpeg_ycbcr420_progressive(yy, cc, rr)),
        decode_jpeg_color(encode_jpeg_ycbcr420(yy, cc, rr)),
    )


def test_progressive_non_mcu_aligned_rejected():
    """Foreign progressive files whose dims are not MCU-aligned would
    decode divergent edge blocks in non-interleaved scans — the codec
    must reject them loudly (ADVICE r6 #4)."""
    import struct

    from nosql_triple_store_spark.functions.jpeg import (
        decode_jpeg_color,
        encode_jpeg_ycbcr420_progressive,
    )

    y = np.zeros((32, 32), dtype=np.uint8)
    cb = np.full((16, 16), 128, dtype=np.uint8)
    cr = np.full((16, 16), 128, dtype=np.uint8)
    payload = bytearray(encode_jpeg_ycbcr420_progressive(y, cb, cr))
    sof = payload.find(b"\xff\xc2")
    assert sof > 0
    # SOF2 segment: marker(2) len(2) precision(1) height(2) width(2)
    struct.pack_into(">HH", payload, sof + 5, 20, 20)
    with pytest.raises(ValueError, match="non-MCU-aligned"):
        decode_jpeg_color(bytes(payload))


def test_progressive_eobrun_spanning_blocks():
    """EOBn with r>0 (an EOB run covering several blocks) needs a
    custom AC Huffman table — the standard K.5 table has no EOB1+
    symbols — so build a minimal 4-block progressive stream by hand:
    DC scan with 4 zero diffs, AC scan = two EOB1 runs (2 blocks
    each). The decoder must skip the covered blocks, leaving all-DC."""
    import struct as st

    from nosql_triple_store_spark.functions.jpeg import (
        DC_BITS,
        DC_VALS,
        QUANT_LUMA,
        ZIGZAG,
        _BitWriter,
        _build_huffman,
        _seg,
        decode_jpeg_gray,
    )

    dc_enc = _build_huffman(DC_BITS, DC_VALS)
    # custom AC table: two 1/2-bit codes for EOB0 (0x00) and EOB1 (0x10)
    ac_bits = [1, 1] + [0] * 14
    ac_vals = [0x00, 0x10]
    ac_enc = _build_huffman(ac_bits, ac_vals)

    dqt = _seg(
        0xFFDB,
        b"\x00" + QUANT_LUMA.reshape(64)[ZIGZAG].astype(np.uint8).tobytes(),
    )
    sof = _seg(0xFFC2, st.pack(">BHHB", 8, 8, 32, 1) + bytes([1, 0x11, 0]))
    dht = _seg(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS)) + _seg(
        0xFFC4, b"\x10" + bytes(ac_bits) + bytes(ac_vals)
    )
    dc_w = _BitWriter()
    for _ in range(4):  # 4 blocks, DC diff 0 (category 0)
        dc_w.write(*dc_enc[0])
    ac_w = _BitWriter()
    for _ in range(2):  # EOB1: run = 2 blocks (1 appended bit = 0)
        ac_w.write(*ac_enc[0x10])
        ac_w.write(0, 1)
    payload = (
        b"\xff\xd8" + dqt + sof + dht
        + _seg(0xFFDA, bytes([1, 1, 0x00, 0, 0, 0])) + dc_w.flush()
        + _seg(0xFFDA, bytes([1, 1, 0x00, 1, 63, 0])) + ac_w.flush()
        + b"\xff\xd9"
    )
    dec = decode_jpeg_gray(payload)
    assert dec.shape == (8, 32)
    assert (dec == 128).all()  # DC 0 everywhere -> level-shift only


def test_progressive_rejects_successive_approximation():
    from nosql_triple_store_spark.functions.jpeg import (
        decode_jpeg_gray,
        encode_jpeg_gray_progressive,
    )

    payload = bytearray(encode_jpeg_gray_progressive(_block_image(3)))
    # set Al=1 in the second (AC) SOS header: last byte of its body
    sos2 = payload.rfind(b"\xff\xda")
    ln = int.from_bytes(payload[sos2 + 2 : sos2 + 4], "big")
    payload[sos2 + 2 + ln - 1] = 0x01
    with pytest.raises(ValueError, match="successive-approximation"):
        decode_jpeg_gray(bytes(payload))
