"""Minimal MJPEG-in-AVI video codec — the close of the video seam.

The reference (gisaia/ARLAS-proc) ships no media codecs at all; this
repo's multimodal surface is beyond-reference, and until round 5 video
was an explicitly documented stub (``multimodal/binary.py``'s
``UnsupportedMediaError`` seam). Motion-JPEG inside a RIFF/AVI
container closes it WITHOUT breaking the dependency-free contract:
the container is pure structured parsing (RIFF chunk walk, public
format: MSDN AVI RIFF reference / OpenDML), and every frame payload is
a baseline JPEG decoded by the existing from-scratch decoder
(``multimodal/jpeg.py``).

Scale shape: DEMUX IS CHEAP, DECODE IS NOT. ``iter_frame_payloads``
walks the container and yields raw per-frame JPEG bytes without
touching the entropy stream, so a frame-sampling pipeline
(``binary.frame_sample_plan``) decodes ONLY the sampled frames — the
per-row work inside an actor-pool ``map_batches`` stage is
O(sampled frames), not O(video duration). Interframe-compressed codecs
(H.264 etc.) need a C library and remain out of scope by design — they
would hit ``UnsupportedMediaError`` at the magic-byte dispatch.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np

from arlas_proc_ray.multimodal.codecs import UnsupportedMediaError
from arlas_proc_ray.multimodal.jpeg import decode_jpeg, encode_jpeg

_AVIH_FMT = "<IIIIIIIIII4I"  # 56-byte main header
_STRH_FMT = "<4s4sIHHIIIIIIII4h"  # 56-byte stream header


def encode_avi_mjpeg(
    frames, *, fps: int = 10, quality: int = 90
) -> bytes:
    """RIFF/AVI bytes for a sequence of uint8 RGB or gray frames, each
    stored as one baseline-JPEG ``00dc`` chunk (+ an ``idx1`` index).

    All frames must share one shape; ``fps`` is written as
    dwRate/dwScale = fps/1 and as the avih micro-seconds-per-frame.
    """
    frames = list(frames)
    if not frames:
        raise ValueError("encode_avi_mjpeg: need at least one frame")
    shape = frames[0].shape
    if any(f.shape != shape for f in frames):
        raise ValueError("encode_avi_mjpeg: frames must share one shape")
    h, w = shape[0], shape[1]
    payloads = [encode_jpeg(np.asarray(f), quality=quality) for f in frames]

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(fourcc: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", fourcc + body)

    max_bytes = max(len(p) for p in payloads)
    avih = struct.pack(
        _AVIH_FMT,
        1_000_000 // fps,          # dwMicroSecPerFrame
        max_bytes * fps,           # dwMaxBytesPerSec (advisory)
        0,                         # dwPaddingGranularity
        0x10,                      # AVIF_HASINDEX
        len(payloads), 0, 1,       # total frames, initial frames, streams
        max_bytes, w, h,           # suggested buffer, width, height
        0, 0, 0, 0,
    )
    strh = struct.pack(
        _STRH_FMT,
        b"vids", b"MJPG", 0, 0, 0, 0,
        1, fps,                    # dwScale, dwRate → fps = rate/scale
        0, len(payloads), max_bytes,
        0xFFFFFFFF, 0,             # quality (default), sample size
        0, 0, w, h,                # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, 24, b"MJPG", h * w * 3, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )

    movi_body = bytearray(b"movi")
    idx = bytearray()
    for p in payloads:
        # idx1 offsets are relative to the 'movi' fourcc position
        idx += b"00dc" + struct.pack("<III", 0x10, len(movi_body), len(p))
        movi_body += chunk(b"00dc", p)
    movi = chunk(b"LIST", bytes(movi_body))
    idx1 = chunk(b"idx1", bytes(idx))

    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _walk_chunks(buf: bytes, lo: int, hi: int) -> Iterator[tuple[bytes, int, int]]:
    """Yield (fourcc, body_lo, body_hi) for each chunk in [lo, hi)."""
    i = lo
    while i + 8 <= hi:
        fourcc = buf[i : i + 4]
        (size,) = struct.unpack_from("<I", buf, i + 4)
        body_lo = i + 8
        body_hi = min(body_lo + size, hi)
        yield fourcc, body_lo, body_hi
        i = body_lo + size + (size & 1)  # chunks are word-aligned


def _movi_bounds(payload: bytes) -> tuple[int, int]:
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise UnsupportedMediaError("not a RIFF/AVI payload")
    for fourcc, lo, hi in _walk_chunks(payload, 12, len(payload)):
        if fourcc == b"LIST" and payload[lo : lo + 4] == b"movi":
            return lo + 4, hi
    raise UnsupportedMediaError("avi: no movi list")


def avi_frame_rate(payload: bytes) -> float:
    """Frames per second from the ``vids`` stream header (dwRate/dwScale),
    falling back to the main header's micro-seconds-per-frame."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise UnsupportedMediaError("not a RIFF/AVI payload")
    usec = None
    for fourcc, lo, hi in _walk_chunks(payload, 12, len(payload)):
        if fourcc == b"LIST" and payload[lo : lo + 4] == b"hdrl":
            for f2, lo2, hi2 in _walk_chunks(payload, lo + 4, hi):
                if f2 == b"avih":
                    usec = struct.unpack_from("<I", payload, lo2)[0]
                if f2 == b"LIST" and payload[lo2 : lo2 + 4] == b"strl":
                    for f3, lo3, hi3 in _walk_chunks(payload, lo2 + 4, hi2):
                        if f3 == b"strh":
                            # fccType fccHandler dwFlags wPriority
                            # wLanguage dwInitialFrames dwScale dwRate
                            typ, _h, _f, _p, _l, _i, scale, rate = (
                                struct.unpack_from(
                                    "<4s4sIHHIII", payload, lo3
                                )
                            )
                            if typ == b"vids" and scale:
                                return rate / scale
    if usec:
        return 1_000_000.0 / usec
    raise UnsupportedMediaError("avi: no vids stream header")


def iter_frame_payloads(payload: bytes) -> Iterator[bytes]:
    """Raw JPEG bytes per video frame, container-walk only (no entropy
    decode) — the pruning point for frame-sampled pipelines."""
    lo, hi = _movi_bounds(payload)
    for fourcc, b_lo, b_hi in _walk_chunks(payload, lo, hi):
        if fourcc[2:4] in (b"dc", b"db"):  # compressed / uncompressed DIB
            yield payload[b_lo:b_hi]
        elif fourcc == b"LIST" and payload[b_lo : b_lo + 4] == b"rec ":
            for f2, lo2, hi2 in _walk_chunks(payload, b_lo + 4, b_hi):
                if f2[2:4] in (b"dc", b"db"):
                    yield payload[lo2:hi2]


def decode_avi_mjpeg(
    payload: bytes, *, frame_indices=None
) -> list[np.ndarray]:
    """Decoded uint8 frames. ``frame_indices`` (sorted iterable) decodes
    ONLY those frames — the demux still walks every chunk header (cheap)
    but the JPEG entropy decode runs per SAMPLED frame."""
    want = None if frame_indices is None else set(int(i) for i in frame_indices)
    out = []
    for i, raw in enumerate(iter_frame_payloads(payload)):
        if want is not None and i not in want:
            continue
        if raw[:2] != b"\xff\xd8":
            raise UnsupportedMediaError(
                "avi: non-JPEG frame payload (only MJPG streams supported)"
            )
        out.append(decode_jpeg(raw))
    return out
