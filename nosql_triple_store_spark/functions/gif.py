"""GIF87a codec (single frame, global palette), pure Python + numpy —
the third real image container after PNG (zlib DEFLATE) and baseline
JPEG (T.81 DCT/Huffman). GIF is palette-indexed and LOSSLESS, so any
image quantized to the palette round-trips exactly — no special fixture
contract needed (unlike JPEG's even-constant-block trick).

Implements the public GIF87a specification: logical screen descriptor,
global color table, image descriptor, and TRUE variable-width LZW
compression (not the emit-clear-per-pixel shortcut): dictionary grows
from (2^min)+2 entries, code width bumps at dictionary size 2^width,
CLEAR resets at the 4096-entry cap, little-endian bit packing in
255-byte sub-blocks. The decoder rejects interlace, local color
tables, and animation blocks loudly rather than mis-decoding.
"""

from __future__ import annotations

import struct

import numpy as np


class _LZWBitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        # GIF packs codes little-endian: new code enters at the TOP
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def _lzw_compress(indices: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    bw = _LZWBitWriter()
    width = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    bw.write(clear, width)
    seq = b""
    for px in indices.tobytes():
        cand = seq + bytes([px])
        if cand in table:
            seq = cand
            continue
        bw.write(table[seq], width)
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        elif next_code > 4095:
            bw.write(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        seq = bytes([px])
    if seq:
        bw.write(table[seq], width)
    bw.write(end, width)
    return bw.flush()


def _lzw_decompress(data: bytes, min_code_size: int, n_px: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    acc = 0
    nbits = 0
    pos = 0
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    while len(out) < n_px:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("LZW stream truncated")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"LZW code {code} beyond table")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    return bytes(out[:n_px])


def encode_gif(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """(h, w) uint8 palette indices + (n, 3) uint8 palette -> GIF87a."""
    h, w = indices.shape
    n = len(palette)
    if n < 2 or n > 256:
        raise ValueError("palette size must be in [2, 256]")
    bits = max(1, (n - 1).bit_length())
    table_n = 1 << bits
    gct = np.zeros((table_n, 3), dtype=np.uint8)
    gct[:n] = palette
    min_code_size = max(2, bits)
    packed = 0x80 | ((bits - 1) << 4) | (bits - 1)
    out = bytearray(b"GIF87a")
    out += struct.pack("<HHBBB", w, h, packed, 0, 0)
    out += gct.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out.append(min_code_size)
    lzw = _lzw_compress(indices.astype(np.uint8).reshape(-1), min_code_size)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def decode_gif(payload: bytes) -> tuple[np.ndarray, np.ndarray]:
    """GIF87a/89a bytes -> ((h, w) uint8 indices, (n, 3) uint8 palette).
    Single non-interlaced frame with a global color table only."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h, packed, _, _ = struct.unpack_from("<HHBBB", payload, 6)
    if not packed & 0x80:
        raise ValueError("GIF without a global color table unsupported")
    bits = (packed & 0x07) + 1
    table_n = 1 << bits
    pos = 13
    palette = np.frombuffer(
        payload, dtype=np.uint8, count=table_n * 3, offset=pos
    ).reshape(table_n, 3)
    pos += table_n * 3
    while pos < len(payload):
        block = payload[pos]
        if block == 0x3B:  # trailer
            raise ValueError("no image descriptor before trailer")
        if block == 0x21:  # extension: skip sub-blocks
            pos += 2
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        left, top, iw, ih, ipacked = struct.unpack_from("<HHHHB", payload, pos + 1)
        if ipacked & 0x80:
            raise ValueError("local color tables unsupported")
        if ipacked & 0x40:
            raise ValueError("interlaced GIF unsupported")
        if (left, top, iw, ih) != (0, 0, w, h):
            raise ValueError("sub-rectangle frames unsupported")
        pos += 10
        min_code_size = payload[pos]
        pos += 1
        lzw = bytearray()
        while payload[pos]:
            ln = payload[pos]
            lzw += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        indices = np.frombuffer(
            _lzw_decompress(bytes(lzw), min_code_size, w * h), dtype=np.uint8
        ).reshape(h, w)
        return indices, palette
    raise ValueError("truncated GIF")
