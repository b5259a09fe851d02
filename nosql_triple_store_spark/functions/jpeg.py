"""Baseline sequential JPEG codec (grayscale), pure numpy + stdlib —
the third real compressed-media codec after PNG/DEFLATE and WAV
(operators/multimodal.py), removing the fake-feature path for the most
common image format (VERDICT r4 #6).

Implements the public ITU-T T.81 (JPEG) spec, baseline DCT mode:
- 8x8 forward/inverse DCT-II (orthonormal matrix form),
- Annex K.1 luminance quantization table,
- Annex K.3/K.5 standard luminance DC/AC Huffman tables (canonical
  code construction from (BITS, HUFFVAL)),
- zigzag scan, DC prediction, (run, size) AC coding, ZRL/EOB,
- JFIF container: SOI / APP0 / DQT / SOF0 / DHT / SOS / entropy-coded
  segment with 0xFF byte stuffing / EOI.

Grayscale (one component) keeps the scope honest: files written here
decode in any JPEG viewer; the decoder rejects multi-component scans
loudly rather than mis-decoding them. Lossy in general — but an image
whose 8x8 blocks are CONSTANT with even (value-128) round-trips
EXACTLY (the only nonzero coefficient is DC = 8*(v-128), and the K.1
DC quantum is 16, so even level-shifts quantize losslessly) — which is
what lets q_multimodal_decode_jpeg carry an analytic SQL oracle.
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

# ---- Annex K.3: luminance DC (BITS, HUFFVAL) ----
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))

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
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
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
            block = shifted[by : by + 8, bx : bx + 8]
            coef = _D @ block @ _D.T
            q = np.rint(coef / QUANT_LUMA).astype(np.int64)
            zz = q.reshape(64)[ZIGZAG]
            # DC
            diff = int(zz[0]) - prev_dc
            prev_dc = int(zz[0])
            s = _category(diff)
            bw.write(*_DC_ENC[s])
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
                    bw.write(*_AC_ENC[0xF0])  # ZRL
                    run -= 16
                s = _category(v)
                bw.write(*_AC_ENC[(run << 4) | s])
                bw.write(_amplitude_bits(v, s), s)
                run = 0
            if run:
                bw.write(*_AC_ENC[0x00])  # EOB
    scan = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    dqt = seg(
        0xFFDB, b"\x00" + QUANT_LUMA.reshape(64)[ZIGZAG].astype(np.uint8).tobytes()
    )
    sof = seg(
        0xFFC0,
        struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]),
    )
    dht = seg(
        0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS)
    ) + seg(0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
    sos = seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    app0 = seg(
        0xFF01 if False else 0xFFE0,
        b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00",
    )
    return (
        b"\xff\xd8" + app0 + dqt + sof + dht + sos + scan + b"\xff\xd9"
    )


def decode_jpeg_gray(payload: bytes) -> np.ndarray:
    """Decode a baseline single-component JPEG to (h, w) uint8.
    Multi-component, progressive, or restart-marker scans raise."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quant = {}
    dc_dec, ac_dec = {}, {}
    h = w = None
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = struct.unpack(">H", payload[pos : pos + 2])[0]
        if marker == 0xFFD9:
            raise ValueError("EOI before SOS")
        pos += 2
        (ln,) = struct.unpack(">H", payload[pos : pos + 2])
        body = payload[pos + 2 : pos + ln]
        if marker == 0xFFDB:
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 0xF
                if pq:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[ZIGZAG] = np.frombuffer(
                    body[o + 1 : o + 65], dtype=np.uint8
                )
                quant[tq] = tbl.reshape(8, 8)
                o += 65
        elif marker == 0xFFC0:
            _, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if ncomp != 1:
                raise ValueError(
                    "only single-component (grayscale) baseline JPEG "
                    "is supported; color needs subsampling + YCbCr"
                )
            comp_tq = body[8]
        elif marker in (0xFFC1, 0xFFC2, 0xFFC3):
            raise ValueError("only baseline sequential (SOF0) supported")
        elif marker == 0xFFC4:
            o = 0
            while o < len(body):
                tc, th = body[o] >> 4, body[o] & 0xF
                bits = list(body[o + 1 : o + 17])
                n = sum(bits)
                vals = list(body[o + 17 : o + 17 + n])
                (dc_dec if tc == 0 else ac_dec)[th] = _decode_table(
                    bits, vals
                )
                o += 17 + n
        elif marker == 0xFFDD:
            raise ValueError("restart intervals unsupported")
        elif marker == 0xFFDA:
            ns = body[0]
            if ns != 1:
                raise ValueError("multi-component scan unsupported")
            td, ta = body[2] >> 4, body[2] & 0xF
            scan_start = pos + ln
            return _decode_scan(
                payload[scan_start:],
                h,
                w,
                quant[comp_tq],
                dc_dec[td],
                ac_dec[ta],
            )
        pos += ln
    raise ValueError("no SOS segment found")


def _decode_scan(data, h, w, qt, dc_tbl, ac_tbl) -> np.ndarray:
    br = _BitReader(data)
    bh, bwid = (h + 7) // 8, (w + 7) // 8
    out = np.empty((bh * 8, bwid * 8), dtype=np.float64)
    prev_dc = 0
    for by in range(bh):
        for bx in range(bwid):
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
                zz[k] = _extend(br.bits(size), size)
                k += 1
            coef = np.zeros(64, dtype=np.float64)
            coef[ZIGZAG] = zz
            block = _D.T @ (coef.reshape(8, 8) * qt) @ _D
            out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block
    return np.clip(np.rint(out + 128.0), 0, 255).astype(np.uint8)[:h, :w]
