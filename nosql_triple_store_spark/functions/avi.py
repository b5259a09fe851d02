"""AVI (RIFF) container codec for MJPEG video, pure stdlib — the
COMPRESSED video ingest path (the concatenated-PPM stream in
operators/multimodal.py is the uncompressed one). Motion-JPEG is the
public format cameras/surveillance corpora actually emit: each frame
is an independent baseline JPEG, which functions/jpeg.py can now
decode in color — so an AVI/MJPEG file round-trips end-to-end with no
external codec library.

Implements the public AVI RIFF structure (Microsoft AVI file format,
msdn 'AVI RIFF File Reference'):
  RIFF('AVI ')
    LIST('hdrl')  avih(MainAVIHeader)  LIST('strl') strh('vids','MJPG')
                  strf(BITMAPINFOHEADER)
    LIST('movi')  '00dc' chunks (one JPEG per frame, word-aligned)
    'idx1'        AVIOLDINDEX entries
The decoder validates magic/fourccs and walks the movi chunks; any
non-AVI payload, non-MJPG stream, or torn chunk raises ValueError
(rejects-loudly contract, same as the JPEG/PNG/GIF decoders).

Frame independence is the scale story: MJPEG has no inter-frame
state, so a 100 TB video corpus splits at ANY frame boundary — the
idx1 index gives byte offsets for free — and per-frame decode
parallelizes embarrassingly inside Arrow kernels.
"""

from __future__ import annotations

import struct


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(fourcc: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", fourcc + body)


def encode_avi_mjpeg(
    frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """Wrap per-frame baseline JPEG payloads as an AVI/MJPEG file."""
    if not frames:
        raise ValueError("encode_avi_mjpeg needs at least one frame")
    n = len(frames)
    max_bytes = max(len(f) for f in frames)
    avih = _chunk(
        b"avih",
        struct.pack(
            "<14I",
            1_000_000 // fps,  # dwMicroSecPerFrame
            max_bytes * fps,  # dwMaxBytesPerSec
            0,  # dwPaddingGranularity
            0x10,  # dwFlags: AVIF_HASINDEX
            n,  # dwTotalFrames
            0,  # dwInitialFrames
            1,  # dwStreams
            max_bytes,  # dwSuggestedBufferSize
            width,
            height,
            0, 0, 0, 0,  # dwReserved[4]
        ),
    )
    strh = _chunk(
        b"strh",
        # full AVISTREAMHEADER layout so external parsers read
        # dwScale/dwRate/dwLength at their spec offsets
        b"vids"  # fccType
        + b"MJPG"  # fccHandler
        + struct.pack(
            "<IHHIIIIIIII4h",
            0,  # dwFlags
            0,  # wPriority
            0,  # wLanguage
            0,  # dwInitialFrames
            1,  # dwScale
            fps,  # dwRate
            0,  # dwStart
            n,  # dwLength
            max_bytes,  # dwSuggestedBufferSize
            0xFFFFFFFF,  # dwQuality (-1 default)
            0,  # dwSampleSize (0: variable-size frames)
            0, 0, width, height,  # rcFrame (left, top, right, bottom)
        ),
    )
    strf = _chunk(
        b"strf",
        struct.pack(
            "<IiiHH4sIiiII",
            40,  # biSize
            width,
            height,
            1,  # biPlanes
            24,  # biBitCount
            b"MJPG",  # biCompression
            width * height * 3,  # biSizeImage
            0, 0, 0, 0,  # resolution + palette
        ),
    )
    hdrl = _list(b"hdrl", avih + _list(b"strl", strh + strf))
    movi_body = b"movi"
    offsets = []
    for f in frames:
        offsets.append(len(movi_body))  # offset of the 00dc fourcc
        movi_body += _chunk(b"00dc", f)
    movi = _chunk(b"LIST", movi_body)
    idx1 = _chunk(
        b"idx1",
        b"".join(
            b"00dc"
            + struct.pack("<III", 0x10, off, len(f))  # AVIIF_KEYFRAME
            for off, f in zip(offsets, frames)
        ),
    )
    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_avi_mjpeg(payload: bytes) -> tuple[int, int, list[bytes]]:
    """Parse an AVI/MJPEG file -> (width, height, [jpeg_frame_bytes]).
    Raises ValueError on anything that is not a single-video-stream
    MJPG AVI."""
    if len(payload) < 12 or payload[:4] != b"RIFF":
        raise ValueError("not a RIFF file")
    (riff_len,) = struct.unpack_from("<I", payload, 4)
    if riff_len + 8 > len(payload):
        raise ValueError("truncated RIFF payload")
    if payload[8:12] != b"AVI ":
        raise ValueError(f"RIFF form {payload[8:12]!r} is not 'AVI '")
    pos = 12
    end = 8 + riff_len
    width = height = None
    compression = None
    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        nonlocal width, height, compression
        while pos + 8 <= end:
            fourcc = payload[pos : pos + 4]
            (ln,) = struct.unpack_from("<I", payload, pos + 4)
            body_start = pos + 8
            body_end = body_start + ln
            if body_end > end:
                raise ValueError(
                    f"torn chunk {fourcc!r} at byte {pos} "
                    f"(len {ln} exceeds enclosure)"
                )
            if fourcc == b"LIST":
                walk(body_start + 4, body_end)
            elif fourcc == b"strf":
                if ln < 40:
                    raise ValueError("strf too short for BITMAPINFOHEADER")
                _, width, height = struct.unpack_from(
                    "<Iii", payload, body_start
                )
                compression = payload[body_start + 16 : body_start + 20]
            elif fourcc == b"strh":
                if payload[body_start : body_start + 4] != b"vids":
                    raise ValueError(
                        "only single-video-stream AVIs supported"
                    )
            elif fourcc[2:4] == b"dc":
                frames.append(payload[body_start:body_end])
            pos = body_end + (ln % 2)  # word alignment

    walk(pos, end)
    if width is None:
        raise ValueError("AVI missing strf header")
    if compression != b"MJPG":
        raise ValueError(
            f"compression {compression!r} unsupported (MJPG only)"
        )
    if not frames:
        raise ValueError("AVI contains no video frames")
    return width, abs(height), frames
