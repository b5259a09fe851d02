"""IMA/DVI ADPCM codec in the standard WAV container (format tag
0x0011) — REAL compressed audio beyond PCM16: 4 bits/sample, the
format telephony/game corpora actually ship, pure stdlib/numpy.

Implements the public IMA ADPCM algorithm (IMA Digital Audio Focus
and Technical Working Groups recommendation, as carried in the
Microsoft WAV fmt 0x11 layout): per block, a 4-byte state header
(int16 predictor = first sample, uint8 step index, reserved byte)
followed by 4-bit nibbles two-per-byte low-first; each nibble updates
the predictor by a signed magnitude step `diff = (step * m / 4) +
(step / 8)`-style shift ladder and walks the 89-entry step table via
the 8-entry index table. Mono only; stereo interleaving raises.

Exactness contract (same trick class as the JPEG constant-MCU
oracle): the block header stores the first sample VERBATIM and nibble
0 at step index 0 adds `step >> 3 = 7 >> 3 = 0`, so a signal that is
CONSTANT within each block round-trips EXACTLY while the codec stays
fully general (lossy for arbitrary signals — bounded-error test in
tests/test_adpcm.py covers that path). q_multimodal_audio_adpcm
derives its analytic SQL oracle from this contract.

Scale: blocks are self-contained (state header per block), so a
100 TB ADPCM corpus splits at any block boundary — the same
frame-independence story as MJPEG; decode is integer-only and
vectorizes per block inside Arrow kernels.
"""

from __future__ import annotations

import struct

import numpy as np

STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
    143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449,
    494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411,
    1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026,
    4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
    11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623,
    27086, 29794, 32767,
]
INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8]


def _clamp16(v: int) -> int:
    return max(-32768, min(32767, v))


def _encode_nibble(diff: int, step: int) -> tuple[int, int]:
    """diff -> (nibble, reconstructed_diff) per the IMA shift ladder."""
    nibble = 0
    if diff < 0:
        nibble = 8
        diff = -diff
    delta = step >> 3
    if diff >= step:
        nibble |= 4
        diff -= step
        delta += step
    step >>= 1
    if diff >= step:
        nibble |= 2
        diff -= step
        delta += step
    step >>= 1
    if diff >= step:
        nibble |= 1
        delta += step
    return nibble, delta


def _decode_diff(nibble: int, step: int) -> int:
    delta = step >> 3
    if nibble & 4:
        delta += step
    if nibble & 2:
        delta += step >> 1
    if nibble & 1:
        delta += step >> 2
    return -delta if nibble & 8 else delta


def encode_wav_adpcm(
    samples: np.ndarray, rate: int, samples_per_block: int = 505
) -> bytes:
    """Encode int16 mono samples as an IMA ADPCM WAV (fmt tag 0x11).
    samples_per_block must be 1 mod 8 per the WAV layout (header
    sample + whole nibble-bytes); 505 is the canonical 256-byte
    block."""
    if samples_per_block % 8 != 1:
        raise ValueError("samples_per_block must be ≡ 1 (mod 8)")
    s = samples.astype(np.int64)
    n = len(s)
    if n == 0:
        raise ValueError("empty signal")
    block_bytes = 4 + (samples_per_block - 1) // 2
    blocks = bytearray()
    index = 0
    for start in range(0, n, samples_per_block):
        chunk = s[start : start + samples_per_block]
        pred = int(chunk[0])
        blocks += struct.pack("<hBB", pred, index, 0)
        nib_lo = None
        for v in chunk[1:]:
            step = STEP_TABLE[index]
            nibble, delta = _encode_nibble(int(v) - pred, step)
            pred = _clamp16(pred + (-delta if nibble & 8 else delta))
            index = max(0, min(88, index + INDEX_TABLE[nibble & 7]))
            if nib_lo is None:
                nib_lo = nibble
            else:
                blocks.append(nib_lo | (nibble << 4))
                nib_lo = None
        if nib_lo is not None:
            blocks.append(nib_lo)
            nib_lo = None
        # pad the final short block to full size (decoder uses the
        # fact chunk's sample count to stop)
        pad = block_bytes - (4 + (len(chunk) - 1 + 1) // 2)
        blocks += b"\x00" * pad
    fmt = struct.pack(
        "<HHIIHHHH",
        0x0011,  # WAVE_FORMAT_IMA_ADPCM
        1,  # mono
        rate,
        rate * block_bytes // samples_per_block,  # avg bytes/sec
        block_bytes,  # block align
        4,  # bits per sample
        2,  # cbSize
        samples_per_block,  # samples per block
    )
    fact = struct.pack("<I", n)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(blocks)) + bytes(blocks)
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_adpcm(payload: bytes) -> tuple[int, np.ndarray]:
    """Decode an IMA ADPCM WAV (fmt 0x11, mono) -> (rate, int16
    samples). Anything else rejects loudly."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, data, spb, block_align, total = 12, None, None, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        chunk = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            tag, ch, rate, _, block_align, bits = struct.unpack(
                "<HHIIHH", chunk[:16]
            )
            if tag != 0x0011:
                raise ValueError(
                    f"format tag 0x{tag:04x} is not IMA ADPCM (0x0011)"
                )
            if ch != 1:
                raise ValueError("only mono ADPCM supported")
            if bits != 4:
                raise ValueError("IMA ADPCM requires 4 bits/sample")
            if size >= 20:
                (spb,) = struct.unpack("<H", chunk[18:20])
        elif cid == b"fact":
            (total,) = struct.unpack("<I", chunk[:4])
        elif cid == b"data":
            data = chunk
        pos += 8 + size + (size & 1)
    if rate is None or data is None or spb is None:
        raise ValueError("missing fmt/data chunk or samples-per-block")
    out = []
    for off in range(0, len(data), block_align):
        block = data[off : off + block_align]
        if len(block) < 4:
            raise ValueError("torn ADPCM block header")
        pred, index, _ = struct.unpack("<hBB", block[:4])
        if index > 88:
            raise ValueError(f"step index {index} out of range")
        out.append(pred)
        produced = 1
        for b in block[4:]:
            for nibble in (b & 0xF, b >> 4):
                if produced >= spb:
                    break
                step = STEP_TABLE[index]
                pred = _clamp16(pred + _decode_diff(nibble, step))
                index = max(0, min(88, index + INDEX_TABLE[nibble & 7]))
                out.append(pred)
                produced += 1
    samples = np.array(out, dtype=np.int16)
    if total is not None:
        samples = samples[:total]
    return rate, samples
