"""FLAC codec subset (RFC 9639 / the public FLAC format): a real
lossless compressed-audio path for the multimodal pipeline, pure
stdlib + numpy.

Unlike mp3/AAC — whose decoders require normative DATA tables
(Huffman codebooks, polyphase window coefficients) that cannot be
derived analytically and are not available in this environment — every
piece of FLAC is computable from the spec's algorithms alone: Rice
coding, fixed polynomial predictors, in-stream LPC coefficients,
CRC-8/CRC-16, and an MD5 of the decoded PCM. That makes a spec-true,
loudly-self-verifying implementation possible here, which is why FLAC
is the compressed-audio format this engine ships (see COVERAGE.md for
the mp3 scope-out rationale).

Encoder (16-bit PCM, mono or stereo):
- STREAMINFO + fixed-blocksize frames; per-subframe choice of
  CONSTANT / VERBATIM / FIXED order 0-2 by minimal residual cost;
  optional mid-side or left-side stereo decorrelation; Rice residuals
  (partition order 0) with the raw-bits escape when Rice would lose.
Decoder (the full 16-bit subset):
- all blocksize/sample-rate/sample-size header codes, UTF-8-style
  frame numbers, CONSTANT / VERBATIM / FIXED 0-4 / LPC subframes,
  wasted bits, all four channel assignments (independent, left-side,
  right-side, mid-side), multi-partition Rice with escapes, and the
  three integrity layers verified loudly: header CRC-8, frame CRC-16,
  stream MD5 (ValueError on any mismatch).

Scale: FLAC frames are self-contained after the header (fixed-blocksize
streams even carry the frame index), so a 100 TB audio corpus shards at
frame boundaries exactly like the MJPEG/ADPCM paths — the Arrow kernel
decodes whole payloads per row; splitting WITHIN a payload would key
frames by (doc_id, frame_no) with the header broadcast.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_CRC8_POLY = 0x07
_CRC16_POLY = 0x8005


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ _CRC8_POLY) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ _CRC16_POLY) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
    return crc


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        if bits == 0:
            return
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a one

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.bytepos = pos
        self.bitpos = 0

    def read(self, bits: int) -> int:
        out = 0
        while bits:
            if self.bytepos >= len(self.data):
                raise ValueError("FLAC: truncated bitstream")
            avail = 8 - self.bitpos
            take = min(bits, avail)
            cur = self.data[self.bytepos]
            out = (out << take) | (
                (cur >> (avail - take)) & ((1 << take) - 1)
            )
            self.bitpos += take
            if self.bitpos == 8:
                self.bitpos = 0
                self.bytepos += 1
            bits -= take
        return out

    def read_signed(self, bits: int) -> int:
        if bits == 0:
            return 0
        v = self.read(bits)
        return v - (1 << bits) if v >= (1 << (bits - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1 << 24:
                raise ValueError("FLAC: runaway unary code")
        return q

    def align(self) -> None:
        if self.bitpos:
            self.bitpos = 0
            self.bytepos += 1


def _utf8_number(n: int) -> bytes:
    """The frame-number coding (UTF-8-style, extended to 36 bits)."""
    if n < 0x80:
        return bytes([n])
    for nbytes, limit in ((2, 11), (3, 16), (4, 21), (5, 26), (6, 31), (7, 36)):
        if n < (1 << limit):
            break
    else:
        raise ValueError("FLAC: frame number exceeds 36 bits")
    out = [0x80 | ((n >> (6 * i)) & 0x3F) for i in range(nbytes - 1)]
    lead = (0xFF00 >> nbytes) & 0xFF
    out.append(lead | (n >> (6 * (nbytes - 1))))
    return bytes(reversed(out))


def _read_utf8_number(br: _BitReader) -> int:
    first = br.read(8)
    if first < 0x80:
        return first
    nbytes = 0
    mask = 0x80
    while first & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("FLAC: invalid UTF-8-coded frame number")
    n = first & (0x7F >> nbytes)
    for _ in range(nbytes - 1):
        b = br.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("FLAC: invalid UTF-8 continuation byte")
        n = (n << 6) | (b & 0x3F)
    return n


def _zigzag(res: np.ndarray) -> np.ndarray:
    return (res << 1) ^ (res >> 63)


def _best_rice_param(u: np.ndarray) -> tuple[int, int]:
    """(param, total_bits) minimizing Rice cost; 15 = escape marker."""
    n = len(u)
    best_r, best_bits = 15, 5 + 32 * n  # escape cost at 32 raw bits
    total = int(u.sum())
    for r in range(15):
        bits = n * (r + 1) + (total >> r)
        if bits < best_bits:
            best_r, best_bits = r, bits
    return best_r, best_bits


def _write_residual(bw: _BitWriter, res: np.ndarray) -> None:
    """Rice method 0, partition order 0, with the raw-bits escape."""
    bw.write(0, 2)  # coding method: 4-bit Rice
    bw.write(0, 4)  # partition order 0
    u = _zigzag(res.astype(np.int64))
    r, _ = _best_rice_param(u)
    if r == 15:
        rawbits = (
            int(np.abs(res).max()).bit_length() + 1 if len(res) else 1
        )
        bw.write(15, 4)
        bw.write(rawbits, 5)
        for v in res:
            bw.write(int(v), rawbits)
        return
    bw.write(r, 4)
    for v in u:
        bw.write_unary(int(v) >> r)
        bw.write(int(v), r)


def _encode_subframe(bw: _BitWriter, s: np.ndarray, bps: int) -> None:
    """One channel's block: CONSTANT / FIXED 0-2 / VERBATIM by cost."""
    bw.write(0, 1)  # zero pad bit
    s64 = s.astype(np.int64)
    if len(s) and (s64 == s64[0]).all():
        bw.write(0b000000, 6)
        bw.write(0, 1)  # no wasted bits
        bw.write(int(s64[0]), bps)
        return
    best = None
    for order in (0, 1, 2):
        if len(s) <= order:
            continue
        res = np.diff(s64, n=order) if order else s64
        u = _zigzag(res)
        _, bits = _best_rice_param(u)
        cost = bits + order * bps
        if best is None or cost < best[2]:
            best = (order, res, cost)
    order, res, cost = best
    if cost >= len(s) * bps:  # incompressible: VERBATIM
        bw.write(0b000001, 6)
        bw.write(0, 1)
        for v in s64:
            bw.write(int(v), bps)
        return
    bw.write(0b001000 | order, 6)
    bw.write(0, 1)  # no wasted bits
    for v in s64[:order]:  # warmup
        bw.write(int(v), bps)
    _write_residual(bw, res)


def encode_flac(
    samples: np.ndarray,
    sample_rate: int = 8000,
    block_size: int = 4096,
    stereo_mode: str = "independent",
) -> bytes:
    """PCM16 -> FLAC. samples: int16 (n,) mono or (n, 2) stereo.
    stereo_mode: independent | left-side | mid-side."""
    s = np.asarray(samples)
    if s.dtype != np.int16:
        raise ValueError("encode_flac expects int16 samples")
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2 or s.shape[1] not in (1, 2):
        raise ValueError("encode_flac expects (n,) or (n, 2) samples")
    n, nch = s.shape
    if n == 0:
        raise ValueError("encode_flac needs at least one sample")
    md5 = hashlib.md5(
        s.astype("<i2").tobytes()
    ).digest()  # interleaved little-endian, per spec
    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.write(block_size, 16)  # min block size
    si.write(block_size, 16)  # max
    si.write(0, 24)  # min frame size unknown
    si.write(0, 24)  # max
    si.write(sample_rate, 20)
    si.write(nch - 1, 3)
    si.write(15, 5)  # bps - 1 = 15
    si.write(n, 36)
    body = si.bytes() + md5
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    for frame_no, start in enumerate(range(0, n, block_size)):
        blk = s[start : start + block_size]
        bs = len(blk)
        bw = _BitWriter()
        bw.write(0b11111111111110, 14)
        bw.write(0, 1)  # reserved
        bw.write(0, 1)  # fixed-blocksize stream
        bw.write(0b0111, 4)  # blocksize: 16-bit value at header end
        bw.write(0, 4)  # sample rate: from STREAMINFO
        if nch == 1:
            chan_code, chans, bpss = 0b0000, [blk[:, 0]], [16]
        elif stereo_mode == "independent":
            chan_code, chans, bpss = 0b0001, [blk[:, 0], blk[:, 1]], [16, 16]
        elif stereo_mode == "left-side":
            left = blk[:, 0].astype(np.int64)
            side = left - blk[:, 1].astype(np.int64)
            chan_code, chans, bpss = 0b1000, [left, side], [16, 17]
        elif stereo_mode == "mid-side":
            left = blk[:, 0].astype(np.int64)
            right = blk[:, 1].astype(np.int64)
            mid = (left + right) >> 1
            side = left - right
            chan_code, chans, bpss = 0b1010, [mid, side], [16, 17]
        else:
            raise ValueError(f"unknown stereo_mode {stereo_mode!r}")
        bw.write(chan_code, 4)
        bw.write(0b100, 3)  # 16 bits per sample
        bw.write(0, 1)  # reserved
        for b in _utf8_number(frame_no):
            bw.write(b, 8)
        bw.write(bs - 1, 16)
        hdr = bw.bytes()
        bw = _BitWriter()
        bw.buf = bytearray(hdr + bytes([_crc8(hdr)]))
        for ch, bps in zip(chans, bpss):
            _encode_subframe(bw, np.asarray(ch), bps)
        bw.align()
        frame = bw.bytes()
        out += frame + struct.pack(">H", _crc16(frame))
    return bytes(out)


def _read_residual(
    br: _BitReader, block_size: int, order: int
) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError(f"FLAC: reserved residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.read(4)
    nparts = 1 << porder
    if block_size % nparts:
        raise ValueError("FLAC: partition count does not divide block")
    res = np.empty(block_size - order, dtype=np.int64)
    pos = 0
    for p in range(nparts):
        cnt = block_size // nparts - (order if p == 0 else 0)
        if cnt < 0:
            raise ValueError("FLAC: predictor order exceeds partition")
        r = br.read(pbits)
        if r == escape:
            rawbits = br.read(5)
            for i in range(cnt):
                res[pos + i] = br.read_signed(rawbits) if rawbits else 0
        else:
            for i in range(cnt):
                q = br.read_unary()
                u = (q << r) | br.read(r)
                res[pos + i] = (u >> 1) ^ -(u & 1)  # un-zigzag
        pos += cnt
    return res


def _decode_subframe(br: _BitReader, block_size: int, bps: int) -> np.ndarray:
    if br.read(1) != 0:
        raise ValueError("FLAC: subframe pad bit set")
    ftype = br.read(6)
    wasted = 0
    if br.read(1):  # wasted-bits flag, then count-1 in unary
        wasted = br.read_unary() + 1
        bps -= wasted
    if ftype == 0b000000:  # CONSTANT
        out = np.full(block_size, br.read_signed(bps), dtype=np.int64)
    elif ftype == 0b000001:  # VERBATIM
        out = np.array(
            [br.read_signed(bps) for _ in range(block_size)], dtype=np.int64
        )
    elif 0b001000 <= ftype <= 0b001100:  # FIXED 0-4
        order = ftype & 0x07
        warm = np.array(
            [br.read_signed(bps) for _ in range(order)], dtype=np.int64
        )
        res = _read_residual(br, block_size, order)
        # an order-o fixed predictor's residual is the o-th finite
        # difference, so reconstruction is o chained cumsums seeded
        # from the warmup's difference pyramid — vectorized, no
        # per-sample Python loop
        cur = res
        for j in range(order - 1, -1, -1):
            init = np.diff(warm, n=j)[-1] if order else 0
            cur = init + np.cumsum(cur)
        out = np.empty(block_size, dtype=np.int64)
        out[:order] = warm
        out[order:] = cur
    elif ftype & 0b100000:  # LPC
        order = (ftype & 0x1F) + 1
        warm = [br.read_signed(bps) for _ in range(order)]
        prec = br.read(4)
        if prec == 15:
            raise ValueError("FLAC: invalid LPC precision code")
        prec += 1
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("FLAC: negative LPC shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        res = _read_residual(br, block_size, order)
        out = np.empty(block_size, dtype=np.int64)
        out[:order] = warm
        for i in range(order, block_size):
            acc = sum(c * out[i - 1 - j] for j, c in enumerate(coefs))
            out[i] = res[i - order] + (acc >> shift)
    else:
        raise ValueError(f"FLAC: reserved subframe type {ftype:#08b}")
    return out << wasted if wasted else out


_BLOCKSIZE_FIXED = {
    0b0001: 192, 0b0010: 576, 0b0011: 1152, 0b0100: 2304, 0b0101: 4608,
    0b1000: 256, 0b1001: 512, 0b1010: 1024, 0b1011: 2048, 0b1100: 4096,
    0b1101: 8192, 0b1110: 16384, 0b1111: 32768,
}
_SAMPLE_SIZE = {0b001: 8, 0b010: 12, 0b100: 16, 0b101: 20, 0b110: 24, 0b111: 32}
_SAMPLE_RATES = {
    0b0001: 88200, 0b0010: 176400, 0b0011: 192000, 0b0100: 8000,
    0b0101: 16000, 0b0110: 22050, 0b0111: 24000, 0b1000: 32000,
    0b1001: 44100, 0b1010: 48000, 0b1011: 96000,
}


def decode_flac(payload: bytes) -> tuple[int, np.ndarray]:
    """FLAC -> (sample_rate, int32 samples: (n,) mono or (n, ch)).
    Verifies header CRC-8, frame CRC-16, and the stream MD5; raises
    ValueError loudly on any bitstream or integrity error."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (bad magic)")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("FLAC: truncated metadata block header")
        hdr = payload[pos]
        length = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + length]
        if len(body) != length:
            raise ValueError("FLAC: truncated metadata block")
        if hdr & 0x7F == 0:
            if length != 34:
                raise ValueError("FLAC: STREAMINFO must be 34 bytes")
            streaminfo = body
        pos += 4 + length
        if hdr & 0x80:
            break
    if streaminfo is None:
        raise ValueError("FLAC: missing STREAMINFO")
    br = _BitReader(streaminfo)
    br.read(16)  # min block
    br.read(16)  # max block
    br.read(24)
    br.read(24)
    sample_rate = br.read(20)
    nch = br.read(3) + 1
    bps = br.read(5) + 1
    total = br.read(36)
    md5_expect = streaminfo[18:34]

    chans: list[list[np.ndarray]] = [[] for _ in range(nch)]
    got = 0
    while got < total:
        frame_start = pos
        br = _BitReader(payload, pos)
        if br.read(14) != 0b11111111111110:
            raise ValueError("FLAC: lost frame sync")
        if br.read(1):
            raise ValueError("FLAC: reserved header bit set")
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        chan_code = br.read(4)
        ss_code = br.read(3)
        if br.read(1):
            raise ValueError("FLAC: reserved header bit set")
        _read_utf8_number(br)
        if bs_code == 0:
            raise ValueError("FLAC: reserved blocksize code")
        elif bs_code == 0b0110:
            block_size = br.read(8) + 1
        elif bs_code == 0b0111:
            block_size = br.read(16) + 1
        else:
            block_size = _BLOCKSIZE_FIXED[bs_code]
        if sr_code == 0b1100:
            br.read(8)
        elif sr_code in (0b1101, 0b1110):
            br.read(16)
        elif sr_code == 0b1111:
            raise ValueError("FLAC: invalid sample-rate code")
        elif sr_code != 0:
            sample_rate = _SAMPLE_RATES[sr_code]
        fbps = bps if ss_code == 0 else _SAMPLE_SIZE.get(ss_code)
        if fbps is None:
            raise ValueError("FLAC: reserved sample-size code")
        hdr_bytes = payload[frame_start : br.bytepos]
        if br.bitpos:
            raise ValueError("FLAC: frame header not byte-aligned")
        crc8 = br.read(8)
        if _crc8(hdr_bytes) != crc8:
            raise ValueError("FLAC: frame header CRC-8 mismatch")
        if chan_code <= 0b0111:
            if chan_code + 1 != nch:
                raise ValueError("FLAC: channel count mismatch")
            subs = [
                _decode_subframe(br, block_size, fbps)
                for _ in range(nch)
            ]
        elif chan_code in (0b1000, 0b1001, 0b1010):
            if nch != 2:
                raise ValueError("FLAC: stereo decorrelation needs 2 ch")
            extra0 = 1 if chan_code == 0b1001 else 0  # side is first?
            a = _decode_subframe(br, block_size, fbps + extra0)
            b = _decode_subframe(
                br, block_size, fbps + (0 if chan_code == 0b1001 else 1)
            )
            if chan_code == 0b1000:  # left-side
                left, side = a, b
                right = left - side
            elif chan_code == 0b1001:  # right-side (side first)
                side, right = a, b
                left = right + side
            else:  # mid-side
                mid, side = a, b
                mid2 = (mid << 1) | (side & 1)
                left = (mid2 + side) >> 1
                right = (mid2 - side) >> 1
            subs = [left, right]
        else:
            raise ValueError(f"FLAC: reserved channel code {chan_code:#06b}")
        br.align()
        frame_bytes = payload[frame_start : br.bytepos]
        crc16 = br.read(16)
        if _crc16(frame_bytes) != crc16:
            raise ValueError("FLAC: frame CRC-16 mismatch")
        take = min(block_size, total - got)
        for c in range(nch):
            chans[c].append(subs[c][:take])
        got += take
        pos = br.bytepos

    arr = np.stack(
        [np.concatenate(c) for c in chans], axis=1
    ).astype(np.int32)
    # stream MD5 over the spec's packed representation (RFC 9639
    # §8.4: interleaved samples, little-endian, sample size rounded
    # up to whole bytes) — covers every bit depth, not just 16
    # (ADVICE r7 #4)
    if any(md5_expect):
        flat = arr.reshape(-1)
        bytes_per = (bps + 7) // 8
        if bytes_per == 1:
            packed = flat.astype("<i1").tobytes()
        elif bytes_per == 2:
            packed = flat.astype("<i2").tobytes()
        elif bytes_per == 3:
            quads = np.frombuffer(
                flat.astype("<i4").tobytes(), dtype=np.uint8
            ).reshape(-1, 4)
            packed = np.ascontiguousarray(quads[:, :3]).tobytes()
        else:
            packed = flat.astype("<i4").tobytes()
        if hashlib.md5(packed).digest() != md5_expect:
            raise ValueError("FLAC: stream MD5 mismatch")
    return sample_rate, arr[:, 0] if nch == 1 else arr
