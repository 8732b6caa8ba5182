"""Real, dependency-free codecs for the multimodal pipeline.

This environment has no Pillow/cv2/pyAV, but two media families decode
with the standard library + numpy alone, which turns the round-1 decode
STUB into a working path end-to-end:

- **WAV audio** (RIFF PCM 8/16/32-bit): stdlib ``wave`` → numpy samples.
- **Netpbm images** (P5 grayscale / P6 RGB, binary): pure numpy parse →
  (h, w[, 3]) uint8 tensors; nearest-neighbor resize is an integer
  index-gather, no interpolation library needed.

PNG and baseline JPEG are decoded HERE (stdlib zlib + numpy; see
decode_png below and multimodal/jpeg.py); video and progressive JPEG
still need a codec library — those raise ``UnsupportedMediaError`` at
the seam, and ``DecodeImage``/``DecodeAudio`` keep the actor-pool
contract either way
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


def window_audio_features(
    samples: np.ndarray, rate: int, *, window_s: float = 0.5,
    hop_s: float | None = None,
) -> pd.DataFrame:
    """Per-window audio features — the framed (VAD/segmentation-grade)
    variant of :func:`audio_features`, fully vectorized: the clip is
    framed into ``window_s`` windows every ``hop_s`` seconds (default =
    no overlap) via one strided gather, and RMS / zero-crossing rate /
    peak compute as row reductions over the (n_windows, win) matrix —
    no per-window Python. The ragged tail (< one window) is dropped,
    matching the usual framing convention."""
    win = max(1, int(round(window_s * rate)))
    hop = win if hop_s is None else max(1, int(round(hop_s * rate)))
    n = len(samples)
    n_win = 0 if n < win else 1 + (n - win) // hop
    if n_win == 0:
        return pd.DataFrame(
            {
                "window_idx": pd.Series([], dtype="int64"),
                "t0_s": pd.Series([], dtype="float64"),
                "rms": pd.Series([], dtype="float64"),
                "zero_crossing_rate": pd.Series([], dtype="float64"),
                "peak": pd.Series([], dtype="float64"),
            }
        )
    idx = (
        np.arange(win)[None, :]
        + (np.arange(n_win, dtype=np.int64) * hop)[:, None]
    )
    m = samples[idx].astype(np.float64)
    rms = np.sqrt(np.mean(m * m, axis=1))
    zcr = np.abs(np.diff(np.signbit(m).astype(np.int8), axis=1)).mean(axis=1)
    peak = np.abs(m).max(axis=1)
    return pd.DataFrame(
        {
            "window_idx": np.arange(n_win, dtype=np.int64),
            "t0_s": (np.arange(n_win, dtype=np.int64) * hop) / rate,
            "rms": rms,
            "zero_crossing_rate": zcr,
            "peak": peak,
        }
    )


class WindowedAudioFeatures:
    """Actor-pool stage: WAV payloads → EXPLODED per-window feature rows
    (one input clip becomes n_windows output rows; id columns are
    carried, the payload column is dropped). The audio analogue of the
    demux-pruned video frame sampler: decode once per clip in the
    actor, frame + reduce vectorized, emit a ragged explode — so
    downstream filters (silence trim, loudness gates) stay row ops.
    Null payloads emit zero rows (same skip convention as the video
    sampler)."""

    def __init__(self, payload_col: str = "payload", *,
                 window_s: float = 0.5, hop_s: float | None = None):
        self.payload_col = payload_col
        self.window_s = window_s
        self.hop_s = hop_s

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        carry = batch.to_pandas().drop(columns=[self.payload_col])
        outs = []
        for i, v in enumerate(batch.column(self.payload_col)):
            if not v.is_valid:
                continue
            samples, rate = decode_wav(v.as_py())
            w = window_audio_features(
                samples, rate, window_s=self.window_s, hop_s=self.hop_s
            )
            if w.empty:
                continue
            for c in carry.columns:
                w[c] = carry[c].iloc[i]
            w["sample_rate"] = np.int64(rate)
            outs.append(w)
        if not outs:
            out = pd.DataFrame(
                {
                    "window_idx": pd.Series([], dtype="int64"),
                    "t0_s": pd.Series([], dtype="float64"),
                    "rms": pd.Series([], dtype="float64"),
                    "zero_crossing_rate": pd.Series([], dtype="float64"),
                    "peak": pd.Series([], dtype="float64"),
                }
            )
            for c in carry.columns:
                out[c] = pd.Series([], dtype=carry[c].dtype)
            out["sample_rate"] = pd.Series([], dtype="int64")
            return out
        return pd.concat(outs, ignore_index=True)


def decode_image(payload: bytes) -> np.ndarray:
    """Dispatch on magic bytes: PNG, baseline JPEG or netpbm → uint8."""
    if payload[:8] == _PNG_MAGIC:
        return decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        from arlas_proc_ray.multimodal.jpeg import decode_jpeg

        return decode_jpeg(payload)
    return decode_pnm(payload)


class DecodeImage:
    """Actor-pool stage: image payloads → resized tensors + stats.

    Real decode for netpbm P5/P6, PNG (8/16-bit and sub-8-bit depths,
    gray/gray+alpha/RGB/RGBA/palette(+tRNS), all five scanline filters,
    both interlace modes — stdlib zlib) AND JPEG
    (multimodal/jpeg.py: Huffman + dequant + vectorized IDCT, 4:4:4 /
    4:2:2 / 4:2:0 / grayscale, restart markers, baseline AND
    progressive scans). Video formats hit the documented
    ``UnsupportedMediaError`` seam where a C codec would plug in.
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
            img = decode_image(v.as_py())
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


# ---------------------------------------------------------------------------
# PNG (non-interlaced, 8-bit gray / gray+alpha / RGB / RGBA) — stdlib zlib
# ---------------------------------------------------------------------------

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color_type -> samples/pixel


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc:
        return a
    return b if pb <= pc else c


# Adam7 pass grid: (x0, y0, dx, dy) per pass — PNG spec, public constants
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _unfilter(raw: bytes, offset: int, w: int, h: int, bpp: int, stride: int | None = None):
    """Undo PNG scanline filters for one (sub-)image of ``h`` rows of
    ``w`` pixels at ``bpp`` filter-bytes per pixel (PNG filters operate
    on BYTES: bpp = channels × bytes-per-sample, minimum 1 for sub-byte
    depths). ``stride`` overrides the row byte width for sub-byte rows
    (= ceil(w·depth/8)). Returns (uint8 array (h, stride), bytes
    consumed)."""
    if stride is None:
        stride = w * bpp
    need = h * (stride + 1)
    if offset + need > len(raw):
        raise UnsupportedMediaError("PNG data length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        row_start = offset + y * (stride + 1)
        ftype = raw[row_start]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=row_start + 1
        ).astype(np.int64)
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up — fully vectorized
            cur = (line + prev) & 0xFF
        elif ftype == 1:  # Sub — per-byte-lane prefix sum (vectorized)
            lanes = line.reshape(-1, bpp)
            cur = (np.cumsum(lanes, axis=0) & 0xFF).reshape(stride)
        elif ftype in (3, 4):  # Average/Paeth: left-sequential
            # Inherently serial per byte lane (each byte needs the
            # reconstructed byte bpp to its left), so the win is making
            # each step cheap: plain Python lists in locals instead of
            # numpy scalar indexing (~100 ns boxing per access), the
            # Paeth predictor inlined branch-free-ish, and the first
            # bpp bytes peeled so the hot loop carries no bounds
            # checks. Same locals-and-lists trick as the jpeg.py
            # entropy decoder; ~6× over the numpy-scalar loop.
            ln = line.tolist()
            pv = prev.tolist()
            cur_l = [0] * stride
            if ftype == 3:
                for x in range(min(bpp, stride)):
                    cur_l[x] = (ln[x] + (pv[x] >> 1)) & 0xFF
                for x in range(bpp, stride):
                    cur_l[x] = (ln[x] + ((cur_l[x - bpp] + pv[x]) >> 1)) & 0xFF
            else:
                for x in range(min(bpp, stride)):
                    # a = c = 0 → p = b, |p-a| = b, |p-b| = 0, |p-c| = b:
                    # predictor is always up unless b == 0 (then a wins,
                    # which is also 0) — i.e. plain Up for the first pixel
                    cur_l[x] = (ln[x] + pv[x]) & 0xFF
                for x in range(bpp, stride):
                    a = cur_l[x - bpp]
                    b = pv[x]
                    c = pv[x - bpp]
                    pa_ = b - c if b >= c else c - b
                    pb = a - c if a >= c else c - a
                    p = a + b - c - c
                    pc_ = p if p >= 0 else -p
                    if pa_ <= pb and pa_ <= pc_:
                        pred = a
                    elif pb <= pc_:
                        pred = b
                    else:
                        pred = c
                    cur_l[x] = (ln[x] + pred) & 0xFF
            cur = np.asarray(cur_l, dtype=np.int64)
        else:
            raise UnsupportedMediaError(f"unknown PNG filter {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out, need


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → array (h, w) or (h, w, channels).

    Pure stdlib-zlib + numpy: every legal bit depth (1/2/4-bit
    gray/palette via one ``unpackbits`` pass, 8-bit, 16-bit returning
    uint16), gray / gray+alpha / RGB / RGBA / palette (tRNS → RGBA)
    color types, all five scanline filters, and BOTH interlace modes
    (Adam7 sub-images unfiltered independently and scattered onto the
    pass grid — PNG spec public constants). Baseline JPEG lives in
    multimodal/jpeg.py; progressive JPEG and video remain the seam.
    """
    import struct
    import zlib

    if payload[:8] != _PNG_MAGIC:
        raise UnsupportedMediaError(f"not a PNG (magic {payload[:4]!r})")
    pos = 8
    ihdr = None
    idat = bytearray()
    plte = None
    trns = None
    while pos + 8 <= len(payload):
        length, ctype = struct.unpack(">I4s", payload[pos : pos + 8])
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = np.frombuffer(data, dtype=np.uint8)
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise UnsupportedMediaError("PNG missing IHDR")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    is_palette = color_type == 3
    sub_byte = depth in (1, 2, 4)
    if (
        depth not in (1, 2, 4, 8, 16)
        or (is_palette and depth == 16)
        or (sub_byte and color_type not in (0, 3))  # spec: gray/palette only
        or (not is_palette and color_type not in _PNG_CHANNELS)
        or interlace not in (0, 1)
    ):
        raise UnsupportedMediaError(
            f"unsupported PNG variant depth={depth} color={color_type} "
            f"interlace={interlace} (needs an image library)"
        )
    if is_palette and plte is None:
        raise UnsupportedMediaError("palette PNG missing PLTE")
    ch = 1 if is_palette else _PNG_CHANNELS[color_type]
    bpp = max(1, ch * depth // 8)  # filter offset is ≥1 byte per spec
    raw = zlib.decompress(bytes(idat))

    def unpack_rows(rows: np.ndarray, width: int) -> np.ndarray:
        """(h, stride) packed sub-byte rows → (h, width, 1) sample values
        (MSB-first within each byte, per spec) — one unpackbits pass."""
        bits = np.unpackbits(rows, axis=1)[:, : width * depth]
        grouped = bits.reshape(rows.shape[0], width, depth)
        weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
        return (grouped * weights).sum(axis=2, dtype=np.uint16).astype(
            np.uint8
        )[:, :, None]

    def row_stride(width: int) -> int:
        return (width * ch * depth + 7) // 8

    if interlace == 0:
        rows, used = _unfilter(raw, 0, w, h, bpp, stride=row_stride(w))
        if used != len(raw):
            raise UnsupportedMediaError("PNG data length mismatch")
        byte_img = (
            unpack_rows(rows, w) if sub_byte else rows.reshape(h, w, bpp)
        )
    else:
        byte_img = np.zeros((h, w, 1 if sub_byte else bpp), dtype=np.uint8)
        offset = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw == 0 or ph == 0:
                continue
            sub, used = _unfilter(
                raw, offset, pw, ph, bpp, stride=row_stride(pw)
            )
            offset += used
            byte_img[y0::dy, x0::dx] = (
                unpack_rows(sub, pw) if sub_byte else sub.reshape(ph, pw, bpp)
            )
        if offset != len(raw):
            raise UnsupportedMediaError("PNG data length mismatch")

    if sub_byte and not is_palette:
        # grayscale sub-byte: scale to full 8-bit range (spec replication:
        # max sample value maps to 255 exactly)
        scale = 255 // ((1 << depth) - 1)
        byte_img = (byte_img.astype(np.uint16) * scale).astype(np.uint8)

    if depth == 16:
        img = (
            byte_img.reshape(h, w, ch, 2)
            .astype(np.uint16)
        )
        img = (img[..., 0] << 8) | img[..., 1]  # big-endian samples
    else:
        img = byte_img.reshape(h, w, ch)

    if is_palette:
        idxs = img[:, :, 0]
        if int(idxs.max(initial=0)) >= len(plte):
            raise UnsupportedMediaError("palette index out of range")
        rgb = plte[idxs]
        if trns is not None:
            alpha = np.full(len(plte), 255, dtype=np.uint8)
            alpha[: len(trns)] = trns
            return np.dstack([rgb, alpha[idxs]])
        return rgb
    return img[:, :, 0] if ch == 1 else img


def encode_png(img: np.ndarray, *, filter_type: int = 0) -> bytes:
    """uint8 (h, w[, ch]) → PNG bytes with one filter type for every row
    (test-fixture encoder; exercises the decoder's filter paths)."""
    import struct
    import zlib

    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    arr = img.astype(np.int64)
    stride = w * ch
    flat = arr.reshape(h, stride)
    # Filtering (unlike UNfiltering) has no serial dependency — the
    # predictor reads ORIGINAL neighbor bytes, all known up front — so
    # every filter encodes as whole-array kernels: left/up/upper-left
    # are shifted views of the pixel matrix.
    if filter_type not in (0, 1, 2, 3, 4):
        raise ValueError(f"unsupported filter {filter_type}")
    up = np.zeros_like(flat)
    up[1:] = flat[:-1]
    left = np.zeros_like(flat)
    left[:, ch:] = flat[:, :-ch]
    if filter_type == 0:
        enc = flat
    elif filter_type == 1:
        enc = (flat - left) & 0xFF
    elif filter_type == 2:
        enc = (flat - up) & 0xFF
    elif filter_type == 3:
        enc = (flat - ((left + up) >> 1)) & 0xFF
    else:
        ul = np.zeros_like(flat)
        ul[1:, ch:] = flat[:-1, :-ch]
        p = left + up - ul
        pa_ = np.abs(p - left)
        pb = np.abs(p - up)
        pc_ = np.abs(p - ul)
        pred = np.where(
            (pa_ <= pb) & (pa_ <= pc_), left, np.where(pb <= pc_, up, ul)
        )
        enc = (flat - pred) & 0xFF
    body = enc.astype(np.uint8)
    lines = bytearray()
    for y in range(h):
        lines.append(filter_type)
        lines.extend(body[y].tobytes())

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines)))
        + chunk(b"IEND", b"")
    )
