"""Real, dependency-free codecs for the multimodal pipeline.

This environment has no Pillow/cv2/pyAV, but two media families decode
with the standard library + numpy alone, which turns the round-1 decode
STUB into a working path end-to-end:

- **WAV audio** (RIFF PCM 8/16/32-bit): stdlib ``wave`` → numpy samples.
- **Netpbm images** (P5 grayscale / P6 RGB, binary): pure numpy parse →
  (h, w[, 3]) uint8 tensors; nearest-neighbor resize is an integer
  index-gather, no interpolation library needed.

Compressed formats (PNG/JPEG/MP4) still need a codec library; the
decoders below raise ``UnsupportedMediaError`` at that seam, and
``DecodeImage``/``DecodeAudio`` keep the actor-pool contract either way
(state in ``__init__``, small batches of large payloads, typed outputs).
"""

from __future__ import annotations

import io
import wave

import numpy as np
import pandas as pd
import pyarrow as pa


class UnsupportedMediaError(NotImplementedError):
    """Raised for media types that need an external codec library."""


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------

_PCM_DTYPES = {1: np.uint8, 2: np.int16, 4: np.int32}


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/PCM WAV bytes → (float64 mono samples in [-1, 1], sample_rate)."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        n = w.getnframes()
        width = w.getsampwidth()
        channels = w.getnchannels()
        rate = w.getframerate()
        raw = w.readframes(n)
    if width not in _PCM_DTYPES:
        raise UnsupportedMediaError(f"unsupported PCM sample width {width}")
    x = np.frombuffer(raw, dtype=_PCM_DTYPES[width]).astype(np.float64)
    if width == 1:  # 8-bit WAV is unsigned
        x = x - 128.0
    x /= float(1 << (8 * width - 1))
    if channels > 1:
        x = x.reshape(-1, channels).mean(axis=1)  # downmix to mono
    return x, rate


def encode_wav(samples: np.ndarray, rate: int = 16_000) -> bytes:
    """float samples in [-1, 1] → 16-bit mono WAV bytes (test fixture aid)."""
    pcm = np.clip(samples, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def audio_features(samples: np.ndarray, rate: int) -> dict[str, float]:
    """Deterministic numpy audio features: duration, RMS, zero-crossing
    rate, spectral centroid (Hz)."""
    n = len(samples)
    if n == 0:
        return {
            "duration_s": 0.0,
            "rms": 0.0,
            "zero_crossing_rate": 0.0,
            "spectral_centroid_hz": 0.0,
        }
    rms = float(np.sqrt(np.mean(samples**2)))
    zcr = float(np.mean(np.abs(np.diff(np.signbit(samples).astype(np.int8)))))
    spec = np.abs(np.fft.rfft(samples))
    freqs = np.fft.rfftfreq(n, d=1.0 / rate)
    total = spec.sum()
    centroid = float((freqs * spec).sum() / total) if total > 0 else 0.0
    return {
        "duration_s": n / rate,
        "rms": rms,
        "zero_crossing_rate": zcr,
        "spectral_centroid_hz": centroid,
    }


# ---------------------------------------------------------------------------
# Netpbm images (P5 = grayscale, P6 = RGB, binary variants)
# ---------------------------------------------------------------------------


def _pnm_header(payload: bytes):
    """Parse the PNM header (magic, width, height, maxval), skipping
    whitespace and ``#`` comments; returns (magic, w, h, data_offset)."""
    pos = 0

    def token():
        nonlocal pos
        while pos < len(payload):
            c = payload[pos : pos + 1]
            if c == b"#":  # comment to end of line
                while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                    pos += 1
            elif c.isspace():
                pos += 1
            else:
                break
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        return payload[start:pos]

    magic = token().decode()
    w, h, maxval = int(token()), int(token()), int(token())
    pos += 1  # single whitespace after maxval
    return magic, w, h, maxval, pos


def decode_pnm(payload: bytes) -> np.ndarray:
    """P5/P6 netpbm bytes → uint8 array (h, w) or (h, w, 3)."""
    if payload[:1] != b"P":  # not netpbm at all (PNG/JPEG/...)
        raise UnsupportedMediaError(
            f"not a netpbm payload (magic {payload[:4]!r}); compressed "
            "formats need an image library at this seam"
        )
    magic, w, h, maxval, off = _pnm_header(payload)
    if magic not in ("P5", "P6") or maxval > 255:
        raise UnsupportedMediaError(f"unsupported netpbm variant {magic}/{maxval}")
    channels = 3 if magic == "P6" else 1
    data = np.frombuffer(payload, dtype=np.uint8, count=w * h * channels, offset=off)
    return data.reshape((h, w, 3)) if channels == 3 else data.reshape((h, w))


def encode_pnm(img: np.ndarray) -> bytes:
    """uint8 (h, w) or (h, w, 3) → P5/P6 bytes (test fixture aid)."""
    if img.ndim == 2:
        magic = b"P5"
    elif img.ndim == 3 and img.shape[2] == 3:
        magic = b"P6"
    else:
        raise ValueError("expected (h, w) or (h, w, 3) uint8")
    h, w = img.shape[:2]
    return magic + f"\n{w} {h}\n255\n".encode() + img.astype(np.uint8).tobytes()


def resize_nearest(img: np.ndarray, size: tuple[int, int]) -> np.ndarray:
    """Nearest-neighbor resize to (height, width) — pure index gather."""
    th, tw = size
    h, w = img.shape[:2]
    rows = np.minimum((np.arange(th) * h) // th, h - 1)
    cols = np.minimum((np.arange(tw) * w) // tw, w - 1)
    return img[rows][:, cols]


# ---------------------------------------------------------------------------
# Actor-pool stages
# ---------------------------------------------------------------------------


class DecodeAudio:
    """Actor-pool stage: WAV payloads → numpy features (real decode)."""

    def __init__(self, payload_col: str = "payload"):
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        rows = []
        for v in batch.column(self.payload_col):
            if not v.is_valid:
                rows.append(
                    {"duration_s": None, "rms": None,
                     "zero_crossing_rate": None, "spectral_centroid_hz": None,
                     "sample_rate": None}
                )
                continue
            samples, rate = decode_wav(v.as_py())
            feats = audio_features(samples, rate)
            feats["sample_rate"] = rate
            rows.append(feats)
        out = batch.to_pandas()
        for k in ("duration_s", "rms", "zero_crossing_rate",
                  "spectral_centroid_hz", "sample_rate"):
            out[k] = [r[k] for r in rows]
        return out.drop(columns=[self.payload_col])


class DecodeImage:
    """Actor-pool stage: netpbm payloads → resized tensors + stats.

    Real decode for P5/P6; compressed formats hit the documented
    ``UnsupportedMediaError`` seam where Pillow/cv2 would plug in.
    Emits (height, width, channels, mean_intensity, thumb) with ``thumb``
    a flattened uint8 tensor of ``target_size`` for downstream models.
    """

    def __init__(self, target_size: tuple[int, int] = (8, 8),
                 payload_col: str = "payload"):
        self.target_size = tuple(target_size)
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        heights, widths, chans, means, thumbs = [], [], [], [], []
        for v in batch.column(self.payload_col):
            if not v.is_valid:
                heights.append(None); widths.append(None); chans.append(None)
                means.append(None); thumbs.append(None)
                continue
            img = decode_pnm(v.as_py())
            heights.append(img.shape[0])
            widths.append(img.shape[1])
            chans.append(1 if img.ndim == 2 else img.shape[2])
            means.append(float(img.mean()))
            thumbs.append(
                resize_nearest(img, self.target_size).ravel().astype(np.uint8)
            )
        out = batch.to_pandas()
        out["height"] = pd.array(heights, dtype="Int64")
        out["width"] = pd.array(widths, dtype="Int64")
        out["channels"] = pd.array(chans, dtype="Int64")
        out["mean_intensity"] = means
        out["thumb"] = thumbs
        return out.drop(columns=[self.payload_col])
