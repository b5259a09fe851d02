"""Baseline sequential JPEG codec (grayscale + 4:2:0 color), pure
numpy + stdlib — the third real compressed-media codec after
PNG/DEFLATE and WAV (operators/multimodal.py), removing the
fake-feature path for the most common image format (VERDICT r4 #6;
color added per VERDICT r5 #2).

Implements the public ITU-T T.81 (JPEG) spec, baseline DCT mode:
- 8x8 forward/inverse DCT-II (orthonormal matrix form),
- Annex K.1 luminance / K.2 chrominance quantization tables,
- Annex K.3-K.6 standard DC/AC Huffman tables (canonical code
  construction from (BITS, HUFFVAL)),
- zigzag scan, DC prediction, (run, size) AC coding, ZRL/EOB,
- JFIF container: SOI / APP0 / DQT / SOF0 / DHT / SOS / entropy-coded
  segment with 0xFF byte stuffing / EOI,
- three-component interleaved scan with 4:2:0 chroma subsampling
  (MCU = 4 luma blocks + Cb + Cr, per-component DC predictors), the
  layout virtually every camera/web JPEG uses, plus BT.601/JFIF
  YCbCr<->RGB conversion with half-up rounding (chosen over banker's
  rounding so an ANSI-SQL oracle can reproduce it with FLOOR(x+0.5)),
- PROGRESSIVE mode (SOF2) with spectral selection: multi-scan parse,
  per-scan coefficient accumulation with EOB-run handling, interleaved
  DC scan + per-component AC band scans (successive approximation is
  rejected loudly; same reconstruction as baseline by construction
  since the quantizer is shared).

Lossy in general — but a plane whose 8x8 blocks are CONSTANT with a
level-shift divisible by the DC quantum round-trips EXACTLY (the only
nonzero coefficient is DC = 8*(v-128); K.1's DC quantum is 16 so even
luma values are lossless, K.2's is 17 so chroma offsets that are
multiples of 17 are lossless) — which is what lets
q_multimodal_decode_jpeg (gray) and q_multimodal_decode_jpeg_color
carry analytic SQL oracles.
"""

from __future__ import annotations

import struct

import numpy as np

# ---- Annex K.1 luminance quantization table (row-major) ----
QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)

# ---- Annex K.2 chrominance quantization table (row-major) ----
QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)

# ---- Annex K.3: luminance DC (BITS, HUFFVAL) ----
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))

# ---- Annex K.4: chrominance DC (BITS, HUFFVAL) ----
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

# ---- Annex K.6: chrominance AC (BITS, HUFFVAL) ----
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# ---- Annex K.5: luminance AC (BITS, HUFFVAL) ----
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _zigzag_order() -> np.ndarray:
    """The 64-entry zigzag permutation, generated (not typed) from the
    diagonal-walk definition to rule out transcription errors."""
    # diagonal d = r + c; odd diagonals walk top-right -> bottom-left
    # (r ascending), even diagonals bottom-left -> top-right (c
    # ascending) — T.81 figure A.6
    order = sorted(
        ((r, c) for r in range(8) for c in range(8)),
        key=lambda rc: (
            rc[0] + rc[1],
            rc[0] if (rc[0] + rc[1]) % 2 else rc[1],
        ),
    )
    flat = np.empty(64, dtype=np.int64)
    for i, (r, c) in enumerate(order):
        flat[i] = r * 8 + c
    return flat


ZIGZAG = _zigzag_order()


def _dct_matrix() -> np.ndarray:
    k = np.arange(8)
    d = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16) / 2
    d[0, :] = 1 / np.sqrt(8)
    return d


_D = _dct_matrix()


def _build_huffman(bits, vals):
    """(BITS, HUFFVAL) -> {symbol: (code, length)} per T.81 canonical
    construction."""
    table = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[idx]] = (code, length)
            idx += 1
            code += 1
        code <<= 1
    return table


_DC_ENC = _build_huffman(DC_BITS, DC_VALS)
_AC_ENC = _build_huffman(AC_BITS, AC_VALS)
_DC_CHROMA_ENC = _build_huffman(DC_CHROMA_BITS, DC_CHROMA_VALS)
_AC_CHROMA_ENC = _build_huffman(AC_CHROMA_BITS, AC_CHROMA_VALS)


def _decode_table(bits, vals):
    """{(code, length): symbol} for the bit-serial decoder."""
    return {cl: sym for sym, cl in _build_huffman(bits, vals).items()}


_DC_DEC = _decode_table(DC_BITS, DC_VALS)
_AC_DEC = _decode_table(AC_BITS, AC_VALS)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing inside entropy-coded data
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated entropy-coded segment")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("truncated entropy-coded segment")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # unstuff
            else:
                raise ValueError(f"marker 0xFF{nxt:02X} inside scan")
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if not self.nbits:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table) -> int:
        code, length = 0, 0
        while True:
            code = (code << 1) | self.bit()
            length += 1
            sym = table.get((code, length))
            if sym is not None:
                return sym
            if length > 16:
                raise ValueError("invalid Huffman code in scan")


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _amplitude_bits(v: int, s: int) -> int:
    return v if v >= 0 else v + (1 << s) - 1


def _extend(bits: int, s: int) -> int:
    """Inverse of _amplitude_bits (T.81 EXTEND procedure)."""
    return bits if bits >= (1 << (s - 1)) else bits - (1 << s) + 1


def _encode_block(bw, block, qt, dc_enc, ac_enc, prev_dc: int) -> int:
    """FDCT + quantize + Huffman-code one level-shifted 8x8 block;
    returns the new DC predictor."""
    coef = _D @ block @ _D.T
    q = np.rint(coef / qt).astype(np.int64)
    zz = q.reshape(64)[ZIGZAG]
    # DC
    diff = int(zz[0]) - prev_dc
    prev_dc = int(zz[0])
    s = _category(diff)
    bw.write(*dc_enc[s])
    if s:
        bw.write(_amplitude_bits(diff, s), s)
    # AC
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            bw.write(*ac_enc[0xF0])  # ZRL
            run -= 16
        s = _category(v)
        bw.write(*ac_enc[(run << 4) | s])
        bw.write(_amplitude_bits(v, s), s)
        run = 0
    if run:
        bw.write(*ac_enc[0x00])  # EOB
    return prev_dc


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">HH", marker, len(body) + 2) + body


_APP0 = _seg(
    0xFFE0,
    b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00",
)


def encode_jpeg_gray(pixels: np.ndarray) -> bytes:
    """Encode an (h, w) uint8 grayscale image as baseline JFIF. h, w
    must be multiples of 8 (no edge replication — keeps the exactness
    contract obvious; pad upstream for free sizes)."""
    h, w = pixels.shape
    if h % 8 or w % 8:
        raise ValueError("encode_jpeg_gray needs multiple-of-8 dims")
    shifted = pixels.astype(np.float64) - 128.0
    bw = _BitWriter()
    prev_dc = 0
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            prev_dc = _encode_block(
                bw,
                shifted[by : by + 8, bx : bx + 8],
                QUANT_LUMA,
                _DC_ENC,
                _AC_ENC,
                prev_dc,
            )
    scan = bw.flush()

    dqt = _seg(
        0xFFDB, b"\x00" + QUANT_LUMA.reshape(64)[ZIGZAG].astype(np.uint8).tobytes()
    )
    sof = _seg(
        0xFFC0,
        struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]),
    )
    dht = _seg(
        0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS)
    ) + _seg(0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
    sos = _seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return (
        b"\xff\xd8" + _APP0 + dqt + sof + dht + sos + scan + b"\xff\xd9"
    )


def encode_jpeg_ycbcr420(
    y: np.ndarray, cb: np.ndarray, cr: np.ndarray
) -> bytes:
    """Encode pre-subsampled YCbCr planes as a baseline 4:2:0 JFIF
    file: y is (h, w) uint8 with h, w multiples of 16; cb and cr are
    (h/2, w/2). Each MCU is 4 luma blocks (2x2, row-major) followed by
    one Cb and one Cr block, with per-component DC predictors — the
    interleaved layout of T.81 A.2.3. Luma uses K.1/K.3/K.5 tables,
    chroma K.2/K.4/K.6."""
    h, w = y.shape
    if h % 16 or w % 16:
        raise ValueError("encode_jpeg_ycbcr420 needs multiple-of-16 dims")
    if cb.shape != (h // 2, w // 2) or cr.shape != (h // 2, w // 2):
        raise ValueError("cb/cr must be half-size planes")
    ys = y.astype(np.float64) - 128.0
    cbs = cb.astype(np.float64) - 128.0
    crs = cr.astype(np.float64) - 128.0
    bw = _BitWriter()
    dcs = [0, 0, 0]  # per-component DC predictors (Y, Cb, Cr)
    for my in range(0, h, 16):
        for mx in range(0, w, 16):
            for sy in (0, 8):
                for sx in (0, 8):
                    dcs[0] = _encode_block(
                        bw,
                        ys[my + sy : my + sy + 8, mx + sx : mx + sx + 8],
                        QUANT_LUMA,
                        _DC_ENC,
                        _AC_ENC,
                        dcs[0],
                    )
            cy, cx = my // 2, mx // 2
            dcs[1] = _encode_block(
                bw,
                cbs[cy : cy + 8, cx : cx + 8],
                QUANT_CHROMA,
                _DC_CHROMA_ENC,
                _AC_CHROMA_ENC,
                dcs[1],
            )
            dcs[2] = _encode_block(
                bw,
                crs[cy : cy + 8, cx : cx + 8],
                QUANT_CHROMA,
                _DC_CHROMA_ENC,
                _AC_CHROMA_ENC,
                dcs[2],
            )
    scan = bw.flush()

    dqt = _seg(
        0xFFDB,
        b"\x00"
        + QUANT_LUMA.reshape(64)[ZIGZAG].astype(np.uint8).tobytes()
        + b"\x01"
        + QUANT_CHROMA.reshape(64)[ZIGZAG].astype(np.uint8).tobytes(),
    )
    sof = _seg(
        0xFFC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, 0x22, 0])  # Y: 2x2 sampling, quant table 0
        + bytes([2, 0x11, 1])  # Cb: 1x1, quant table 1
        + bytes([3, 0x11, 1]),  # Cr: 1x1, quant table 1
    )
    dht = (
        _seg(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
        + _seg(0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
        + _seg(
            0xFFC4, b"\x01" + bytes(DC_CHROMA_BITS) + bytes(DC_CHROMA_VALS)
        )
        + _seg(
            0xFFC4, b"\x11" + bytes(AC_CHROMA_BITS) + bytes(AC_CHROMA_VALS)
        )
    )
    sos = _seg(
        0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    )
    return (
        b"\xff\xd8" + _APP0 + dqt + sof + dht + sos + scan + b"\xff\xd9"
    )


def _quantized_blocks(shifted: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """Level-shifted plane -> (bh, bw, 64) zigzag quantized coefs."""
    h, w = shifted.shape
    bh, bw = h // 8, w // 8
    out = np.empty((bh, bw, 64), dtype=np.int64)
    for by in range(bh):
        for bx in range(bw):
            block = shifted[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            q = np.rint((_D @ block @ _D.T) / qt).astype(np.int64)
            out[by, bx] = q.reshape(64)[ZIGZAG]
    return out


def _write_dc(bw: _BitWriter, diff: int, dc_enc) -> None:
    s = _category(diff)
    bw.write(*dc_enc[s])
    if s:
        bw.write(_amplitude_bits(diff, s), s)


def _write_ac_band(bw: _BitWriter, zz, ss: int, se: int, ac_enc) -> None:
    """Run-length code coefficients zz[ss..se]; a trailing zero run is
    EOB0 (a progressive EOB run of exactly one block — bit-identical
    to the baseline EOB symbol)."""
    run = 0
    for k in range(ss, se + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            bw.write(*ac_enc[0xF0])  # ZRL
            run -= 16
        s = _category(v)
        bw.write(*ac_enc[(run << 4) | s])
        bw.write(_amplitude_bits(v, s), s)
        run = 0
    if run:
        bw.write(*ac_enc[0x00])  # EOB0


def _sos(comps: list[tuple[int, int, int]], ss: int, se: int) -> bytes:
    """SOS segment: [(comp_id, td, ta)], band [ss, se], Ah=Al=0."""
    body = bytes([len(comps)])
    for cid, td, ta in comps:
        body += bytes([cid, (td << 4) | ta])
    return _seg(0xFFDA, body + bytes([ss, se, 0]))


def encode_jpeg_gray_progressive(pixels: np.ndarray) -> bytes:
    """Encode an (h, w) uint8 grayscale image as PROGRESSIVE (SOF2)
    JFIF with spectral selection: scan 1 delivers every block's DC,
    scan 2 the full AC band — the two-pass structure progressive web
    JPEGs use (minus successive approximation). Same quantizer and
    Huffman tables as the baseline encoder, so the constant-block
    exactness contract carries over verbatim."""
    h, w = pixels.shape
    if h % 8 or w % 8:
        raise ValueError("encode_jpeg_gray_progressive needs x8 dims")
    zz = _quantized_blocks(pixels.astype(np.float64) - 128.0, QUANT_LUMA)
    bh, bw_ = zz.shape[:2]
    dc_w = _BitWriter()
    prev = 0
    for by in range(bh):
        for bx in range(bw_):
            _write_dc(dc_w, int(zz[by, bx, 0]) - prev, _DC_ENC)
            prev = int(zz[by, bx, 0])
    ac_w = _BitWriter()
    for by in range(bh):
        for bx in range(bw_):
            _write_ac_band(ac_w, zz[by, bx], 1, 63, _AC_ENC)
    dqt = _seg(
        0xFFDB,
        b"\x00" + QUANT_LUMA.reshape(64)[ZIGZAG].astype(np.uint8).tobytes(),
    )
    sof = _seg(
        0xFFC2, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    )
    dht = _seg(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS)) + _seg(
        0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS)
    )
    return (
        b"\xff\xd8" + _APP0 + dqt + sof + dht
        + _sos([(1, 0, 0)], 0, 0) + dc_w.flush()
        + _sos([(1, 0, 0)], 1, 63) + ac_w.flush()
        + b"\xff\xd9"
    )


def encode_jpeg_ycbcr420_progressive(
    y: np.ndarray, cb: np.ndarray, cr: np.ndarray
) -> bytes:
    """Progressive (SOF2) 4:2:0 color encode, spectral selection:
    scan 1 is the interleaved DC pass over MCUs (4 luma + Cb + Cr DC
    diffs with per-component predictors), scans 2-4 are per-component
    AC band passes in each component's own raster order (T.81 G.1.1:
    progressive AC scans are non-interleaved). Table choices match the
    baseline color encoder."""
    h, w = y.shape
    if h % 16 or w % 16:
        raise ValueError("encode_jpeg_ycbcr420_progressive needs x16 dims")
    if cb.shape != (h // 2, w // 2) or cr.shape != (h // 2, w // 2):
        raise ValueError("cb/cr must be half-size planes")
    zzy = _quantized_blocks(y.astype(np.float64) - 128.0, QUANT_LUMA)
    zzcb = _quantized_blocks(cb.astype(np.float64) - 128.0, QUANT_CHROMA)
    zzcr = _quantized_blocks(cr.astype(np.float64) - 128.0, QUANT_CHROMA)
    mcuy, mcux = h // 16, w // 16
    dc_w = _BitWriter()
    preds = [0, 0, 0]
    for my in range(mcuy):
        for mx in range(mcux):
            for by in (0, 1):
                for bx in (0, 1):
                    v = int(zzy[my * 2 + by, mx * 2 + bx, 0])
                    _write_dc(dc_w, v - preds[0], _DC_ENC)
                    preds[0] = v
            v = int(zzcb[my, mx, 0])
            _write_dc(dc_w, v - preds[1], _DC_CHROMA_ENC)
            preds[1] = v
            v = int(zzcr[my, mx, 0])
            _write_dc(dc_w, v - preds[2], _DC_CHROMA_ENC)
            preds[2] = v
    ac_streams = []
    for zz, enc in ((zzy, _AC_ENC), (zzcb, _AC_CHROMA_ENC), (zzcr, _AC_CHROMA_ENC)):
        wtr = _BitWriter()
        for by in range(zz.shape[0]):
            for bx in range(zz.shape[1]):
                _write_ac_band(wtr, zz[by, bx], 1, 63, enc)
        ac_streams.append(wtr.flush())
    dqt = _seg(
        0xFFDB,
        b"\x00"
        + QUANT_LUMA.reshape(64)[ZIGZAG].astype(np.uint8).tobytes()
        + b"\x01"
        + QUANT_CHROMA.reshape(64)[ZIGZAG].astype(np.uint8).tobytes(),
    )
    sof = _seg(
        0xFFC2,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, 0x22, 0])
        + bytes([2, 0x11, 1])
        + bytes([3, 0x11, 1]),
    )
    dht = (
        _seg(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
        + _seg(0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
        + _seg(0xFFC4, b"\x01" + bytes(DC_CHROMA_BITS) + bytes(DC_CHROMA_VALS))
        + _seg(0xFFC4, b"\x11" + bytes(AC_CHROMA_BITS) + bytes(AC_CHROMA_VALS))
    )
    return (
        b"\xff\xd8" + _APP0 + dqt + sof + dht
        + _sos([(1, 0, 0), (2, 1, 1), (3, 1, 1)], 0, 0) + dc_w.flush()
        + _sos([(1, 0, 0)], 1, 63) + ac_streams[0]
        + _sos([(2, 1, 1)], 1, 63) + ac_streams[1]
        + _sos([(3, 1, 1)], 1, 63) + ac_streams[2]
        + b"\xff\xd9"
    )


def rgb_to_ycbcr420(rgb: np.ndarray):
    """(h, w, 3) uint8 RGB -> (y, cb, cr) planes with 2x2 chroma
    box-average subsampling; BT.601/JFIF full-range matrix, half-up
    rounding (matches the SQL-reproducible decoder rounding)."""
    h, w, _ = rgb.shape
    if h % 16 or w % 16:
        raise ValueError("rgb_to_ycbcr420 needs multiple-of-16 dims")
    r = rgb[:, :, 0].astype(np.float64)
    g = rgb[:, :, 1].astype(np.float64)
    b = rgb[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    half = lambda a: np.clip(np.floor(a + 0.5), 0, 255).astype(  # noqa: E731
        np.uint8
    )
    sub = lambda p: (  # noqa: E731 - 2x2 box average
        p.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    )
    return half(y), half(sub(cb)), half(sub(cr))


def ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray):
    """Full-size planes -> (h, w, 3) uint8 RGB; BT.601/JFIF inverse,
    half-up rounding + clip (FLOOR(x+0.5) — reproducible in SQL)."""
    yf = y.astype(np.float64)
    cbf = cb.astype(np.float64) - 128.0
    crf = cr.astype(np.float64) - 128.0
    r = yf + 1.402 * crf
    g = yf - 0.344136 * cbf - 0.714136 * crf
    b = yf + 1.772 * cbf
    out = np.stack([r, g, b], axis=-1)
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


class _Scan:
    """One SOS header + its entropy-coded data: component selectors
    with table ids, spectral band [ss, se], successive-approximation
    bit positions (ah, al)."""

    def __init__(self, comps, ss, se, ah, al, data):
        self.comps = comps  # [(comp_index, td, ta)]
        self.ss = ss
        self.se = se
        self.ah = ah
        self.al = al
        self.data = data


class _Frame:
    """Parsed stream state: quant/Huffman tables, SOF0/SOF2 geometry
    and component specs, and ALL scans (baseline has one, progressive
    several)."""

    def __init__(self):
        self.quant = {}
        self.dc_dec = {}
        self.ac_dec = {}
        self.h = self.w = None
        self.comps = []  # [(comp_id, hi, vi, tq)]
        self.progressive = False
        self.scans: list[_Scan] = []
        self.scan = None  # legacy: scans[0].comps
        self.scan_data = None  # legacy: scans[0].data


def _entropy_end(payload: bytes, start: int) -> int:
    """Index just past the entropy-coded data beginning at start:
    the next 0xFF byte not followed by 0x00 (stuffing)."""
    i = start
    n = len(payload)
    while i < n - 1:
        if payload[i] == 0xFF:
            nxt = payload[i + 1]
            if nxt == 0x00:
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                raise ValueError("restart markers inside scan unsupported")
            return i
        i += 1
    raise ValueError("entropy-coded segment missing terminating marker")


def _parse_jpeg(payload: bytes) -> _Frame:
    """Marker walk over the whole stream (all scans); every malformed
    or unsupported structure raises ValueError with a descriptive
    message ('rejects loudly' contract, hardened per ADVICE r5).
    Accepts baseline SOF0 and progressive SOF2 (spectral selection;
    successive approximation rejected at decode)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    fr = _Frame()
    pos = 2
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = struct.unpack(">H", payload[pos : pos + 2])[0]
        if marker == 0xFFD9:
            if fr.scans:
                break
            raise ValueError("EOI before SOS")
        pos += 2
        if pos + 2 > len(payload):
            raise ValueError("truncated segment header")
        (ln,) = struct.unpack(">H", payload[pos : pos + 2])
        body = payload[pos + 2 : pos + ln]
        if marker == 0xFFDB:
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 0xF
                if pq:
                    raise ValueError("16-bit quant tables unsupported")
                if o + 65 > len(body):
                    raise ValueError("truncated DQT segment")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[ZIGZAG] = np.frombuffer(
                    body[o + 1 : o + 65], dtype=np.uint8
                )
                fr.quant[tq] = tbl.reshape(8, 8)
                o += 65
        elif marker in (0xFFC0, 0xFFC2):
            fr.progressive = marker == 0xFFC2
            _, fr.h, fr.w, ncomp = struct.unpack(">BHHB", body[:6])
            if ncomp not in (1, 3):
                raise ValueError(
                    f"{ncomp}-component JPEG unsupported (gray or "
                    "YCbCr only)"
                )
            if len(body) < 6 + 3 * ncomp:
                raise ValueError("truncated SOF segment")
            fr.comps = [
                (
                    body[6 + 3 * i],
                    body[7 + 3 * i] >> 4,
                    body[7 + 3 * i] & 0xF,
                    body[8 + 3 * i],
                )
                for i in range(ncomp)
            ]
        elif marker in (0xFFC1, 0xFFC3):
            raise ValueError(
                "only baseline (SOF0) and progressive (SOF2) supported"
            )
        elif marker == 0xFFC4:
            o = 0
            while o < len(body):
                tc, th = body[o] >> 4, body[o] & 0xF
                bits = list(body[o + 1 : o + 17])
                n = sum(bits)
                if o + 17 + n > len(body):
                    raise ValueError("truncated DHT segment")
                vals = list(body[o + 17 : o + 17 + n])
                (fr.dc_dec if tc == 0 else fr.ac_dec)[th] = _decode_table(
                    bits, vals
                )
                o += 17 + n
        elif marker == 0xFFDD:
            raise ValueError("restart intervals unsupported")
        elif marker == 0xFFDA:
            if fr.h is None:
                raise ValueError("SOS before SOF0 (no frame header)")
            ns = body[0]
            if ns > len(fr.comps) or ns < 1:
                raise ValueError(f"scan has invalid component count {ns}")
            if not fr.progressive and ns != len(fr.comps):
                raise ValueError(
                    f"scan has {ns} components, frame has "
                    f"{len(fr.comps)} (non-interleaved baseline "
                    "unsupported)"
                )
            ids = {c[0]: i for i, c in enumerate(fr.comps)}
            scomps = []
            for i in range(ns):
                cid = body[1 + 2 * i]
                if cid not in ids:
                    raise ValueError(f"scan component id {cid} not in SOF0")
                td = body[2 + 2 * i] >> 4
                ta = body[2 + 2 * i] & 0xF
                ci = ids[cid]
                tq = fr.comps[ci][3]
                if tq not in fr.quant:
                    raise ValueError(f"missing DQT table {tq}")
                scomps.append((ci, td, ta))
            if len(body) < 1 + 2 * ns + 3:
                raise ValueError("truncated SOS header")
            ss = body[1 + 2 * ns]
            se = body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            # table-presence checks depend on the band: DC scans need
            # the DC table, AC scans the AC table
            for ci, td, ta in scomps:
                if ss == 0 and td not in fr.dc_dec:
                    raise ValueError(f"missing DC Huffman table {td}")
                if se > 0 and ta not in fr.ac_dec:
                    raise ValueError(f"missing AC Huffman table {ta}")
            data_start = pos + ln
            if fr.progressive:
                data_end = _entropy_end(payload, data_start)
            else:
                data_end = len(payload)
            fr.scans.append(
                _Scan(
                    scomps, ss, se, ahal >> 4, ahal & 0xF,
                    payload[data_start:data_end],
                )
            )
            if not fr.progressive:
                break
            pos = data_end
            continue
        pos += ln
    if not fr.scans:
        raise ValueError("no SOS segment found")
    fr.scan = fr.scans[0].comps
    fr.scan_data = fr.scans[0].data
    return fr


def _decode_block(br, dc_tbl, ac_tbl, qt, prev_dc: int):
    """Huffman-decode + dequantize + IDCT one 8x8 block; returns
    (float block, new DC predictor)."""
    zz = np.zeros(64, dtype=np.int64)
    s = br.huff(dc_tbl)
    diff = _extend(br.bits(s), s) if s else 0
    prev_dc += diff
    zz[0] = prev_dc
    k = 1
    while k < 64:
        sym = br.huff(ac_tbl)
        if sym == 0x00:  # EOB
            break
        run, size = sym >> 4, sym & 0xF
        if size == 0:
            if run != 15:
                raise ValueError(f"bad AC symbol {sym:02x}")
            k += 16  # ZRL
            continue
        k += run
        if k > 63:
            raise ValueError("AC run overflows block")
        zz[k] = _extend(br.bits(size), size)
        k += 1
    coef = np.zeros(64, dtype=np.float64)
    coef[ZIGZAG] = zz
    return _D.T @ (coef.reshape(8, 8) * qt) @ _D, prev_dc


def decode_jpeg_gray(payload: bytes) -> np.ndarray:
    """Decode a single-component JPEG — baseline (SOF0) or
    spectral-selection progressive (SOF2) — to (h, w) uint8. Color
    (use decode_jpeg_color) and restart-marker scans raise."""
    fr = _parse_jpeg(payload)
    if len(fr.comps) != 1:
        raise ValueError(
            "decode_jpeg_gray: multi-component scan — use "
            "decode_jpeg_color for YCbCr JPEGs"
        )
    if fr.progressive:
        coefs = _decode_progressive_coefs(fr)[0]
        plane = _idct_plane(coefs, fr.quant[fr.comps[0][3]])
        return np.clip(np.rint(plane + 128.0), 0, 255).astype(np.uint8)[
            : fr.h, : fr.w
        ]
    ci, td, ta = fr.scan[0]
    qt = fr.quant[fr.comps[ci][3]]
    dc_tbl, ac_tbl = fr.dc_dec[td], fr.ac_dec[ta]
    h, w = fr.h, fr.w
    br = _BitReader(fr.scan_data)
    bh, bwid = (h + 7) // 8, (w + 7) // 8
    out = np.empty((bh * 8, bwid * 8), dtype=np.float64)
    prev_dc = 0
    for by in range(bh):
        for bx in range(bwid):
            block, prev_dc = _decode_block(br, dc_tbl, ac_tbl, qt, prev_dc)
            out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block
    return np.clip(np.rint(out + 128.0), 0, 255).astype(np.uint8)[:h, :w]


def decode_jpeg_ycbcr420(payload: bytes):
    """Decode a 4:2:0 YCbCr JPEG — baseline (SOF0) or spectral-
    selection progressive (SOF2) — to (y, cb, cr) uint8 planes (cb/cr
    at half resolution, no upsampling applied). Raises on any sampling
    layout other than Y=2x2, Cb=Cr=1x1."""
    fr = _parse_jpeg(payload)
    if len(fr.comps) != 3:
        raise ValueError("decode_jpeg_ycbcr420 needs a 3-component scan")
    samp = [(c[1], c[2]) for c in fr.comps]
    if samp != [(2, 2), (1, 1), (1, 1)]:
        raise ValueError(
            f"unsupported sampling {samp}; only 4:2:0 "
            "(Y 2x2, Cb/Cr 1x1) is implemented"
        )
    h, w = fr.h, fr.w
    if fr.progressive:
        coefs = _decode_progressive_coefs(fr)
        u8p = lambda p: np.clip(  # noqa: E731
            np.rint(p + 128.0), 0, 255
        ).astype(np.uint8)
        yp = u8p(_idct_plane(coefs[0], fr.quant[fr.comps[0][3]]))
        cbp = u8p(_idct_plane(coefs[1], fr.quant[fr.comps[1][3]]))
        crp = u8p(_idct_plane(coefs[2], fr.quant[fr.comps[2][3]]))
        return (
            yp[:h, :w],
            cbp[: (h + 1) // 2, : (w + 1) // 2],
            crp[: (h + 1) // 2, : (w + 1) // 2],
        )
    mh, mw = (h + 15) // 16, (w + 15) // 16
    y = np.empty((mh * 16, mw * 16), dtype=np.float64)
    cbp = np.empty((mh * 8, mw * 8), dtype=np.float64)
    crp = np.empty((mh * 8, mw * 8), dtype=np.float64)
    tbls = []
    for ci, td, ta in fr.scan:
        tbls.append(
            (fr.dc_dec[td], fr.ac_dec[ta], fr.quant[fr.comps[ci][3]])
        )
    br = _BitReader(fr.scan_data)
    dcs = [0, 0, 0]
    for my in range(mh):
        for mx in range(mw):
            for sy in (0, 8):
                for sx in (0, 8):
                    block, dcs[0] = _decode_block(
                        br, tbls[0][0], tbls[0][1], tbls[0][2], dcs[0]
                    )
                    y[
                        my * 16 + sy : my * 16 + sy + 8,
                        mx * 16 + sx : mx * 16 + sx + 8,
                    ] = block
            for plane, i in ((cbp, 1), (crp, 2)):
                block, dcs[i] = _decode_block(
                    br, tbls[i][0], tbls[i][1], tbls[i][2], dcs[i]
                )
                plane[
                    my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8
                ] = block
    u8 = lambda p: np.clip(  # noqa: E731
        np.rint(p + 128.0), 0, 255
    ).astype(np.uint8)
    return (
        u8(y)[:h, :w],
        u8(cbp)[: (h + 1) // 2, : (w + 1) // 2],
        u8(crp)[: (h + 1) // 2, : (w + 1) // 2],
    )


def _decode_progressive_coefs(fr: _Frame):
    """Run every progressive scan, accumulating quantized DCT
    coefficients per component. Supports spectral selection with
    Ah=Al=0 (successive approximation rejected loudly); DC scans may
    be interleaved or single-component, AC scans are single-component
    per T.81 G.1.1. Returns {ci: (bh, bw, 64) int64 zigzag coefs}."""
    hmax = max(c[1] for c in fr.comps)
    vmax = max(c[2] for c in fr.comps)
    mcux = (fr.w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (fr.h + 8 * vmax - 1) // (8 * vmax)
    dims = {}
    for ci, (_, hi, vi, _) in enumerate(fr.comps):
        # component's own raster dims (non-interleaved scans) — for
        # the MCU-aligned sizes this codec emits they equal the
        # interleaved padded dims
        cw = (fr.w * hi + hmax - 1) // hmax
        ch = (fr.h * vi + vmax - 1) // vmax
        dims[ci] = ((ch + 7) // 8, (cw + 7) // 8)
        if dims[ci] != (mcuy * vi, mcux * hi):
            # foreign progressive files with non-MCU-aligned dims:
            # non-interleaved scans would decode fewer blocks than
            # the interleaved padded allocation expects, silently
            # diverging at the edges — reject loudly instead
            raise ValueError(
                "progressive JPEG with non-MCU-aligned dimensions "
                f"unsupported (component {ci}: raster blocks "
                f"{dims[ci]}, MCU-padded {(mcuy * vi, mcux * hi)})"
            )
    coefs = {
        ci: np.zeros((mcuy * fr.comps[ci][2], mcux * fr.comps[ci][1], 64),
                     dtype=np.int64)
        for ci in dims
    }
    for scan in fr.scans:
        if scan.ah or scan.al:
            raise ValueError(
                "successive-approximation progressive scans unsupported "
                "(spectral selection only)"
            )
        br = _BitReader(scan.data)
        if scan.ss == 0:
            if scan.se != 0:
                raise ValueError("progressive DC scan must have Se=0")
            preds = {ci: 0 for ci, _, _ in scan.comps}
            if len(scan.comps) > 1:  # interleaved MCU order
                for _my in range(mcuy):
                    for _mx in range(mcux):
                        for ci, td, _ta in scan.comps:
                            _, hi, vi, _ = fr.comps[ci]
                            for by in range(vi):
                                for bx in range(hi):
                                    s = br.huff(fr.dc_dec[td])
                                    diff = (
                                        _extend(br.bits(s), s) if s else 0
                                    )
                                    preds[ci] += diff
                                    coefs[ci][
                                        _my * vi + by, _mx * hi + bx, 0
                                    ] = preds[ci]
            else:  # single component, its own raster order
                ci, td, _ta = scan.comps[0]
                bh, bw = dims[ci]
                for by in range(bh):
                    for bx in range(bw):
                        s = br.huff(fr.dc_dec[td])
                        diff = _extend(br.bits(s), s) if s else 0
                        preds[ci] += diff
                        coefs[ci][by, bx, 0] = preds[ci]
        else:  # AC band scan: single component per spec
            if len(scan.comps) != 1:
                raise ValueError("progressive AC scan must be 1-component")
            ci, _td, ta = scan.comps[0]
            ac = fr.ac_dec[ta]
            bh, bw = dims[ci]
            eobrun = 0
            for by in range(bh):
                for bx in range(bw):
                    if eobrun:
                        eobrun -= 1
                        continue
                    k = scan.ss
                    while k <= scan.se:
                        sym = br.huff(ac)
                        r, s = sym >> 4, sym & 0xF
                        if s == 0:
                            if r == 15:
                                k += 16  # ZRL
                                continue
                            # EOBn: run of 2^r + appended bits blocks
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += br.bits(r)
                            break
                        k += r
                        if k > scan.se:
                            raise ValueError("AC run overflows band")
                        coefs[ci][by, bx, k] = _extend(br.bits(s), s)
                        k += 1
    return coefs


def _idct_plane(coefs: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """(bh, bw, 64) zigzag coefs -> (bh*8, bw*8) float sample plane."""
    bh, bw, _ = coefs.shape
    out = np.empty((bh * 8, bw * 8), dtype=np.float64)
    for by in range(bh):
        for bx in range(bw):
            coef = np.zeros(64, dtype=np.float64)
            coef[ZIGZAG] = coefs[by, bx]
            out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                _D.T @ (coef.reshape(8, 8) * qt) @ _D
            )
    return out


def decode_jpeg_color(payload: bytes) -> np.ndarray:
    """Decode a baseline 4:2:0 YCbCr JPEG to an (h, w, 3) uint8 RGB
    image: plane decode + 2x nearest-neighbor chroma upsampling +
    BT.601/JFIF conversion with half-up rounding."""
    y, cb, cr = decode_jpeg_ycbcr420(payload)
    h, w = y.shape
    up = lambda p: np.repeat(np.repeat(p, 2, axis=0), 2, axis=1)[  # noqa: E731
        :h, :w
    ]
    return ycbcr_to_rgb(y, up(cb), up(cr))
