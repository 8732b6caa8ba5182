"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images / audio / video are carried as Arrow ``binary`` columns with typed
metadata columns alongside. The decode/resize/feature-extract kernels are
actor-pool ``map_batches`` stages. REAL decoders live in
``multimodal.codecs`` (WAV via stdlib ``wave``; netpbm P5/P6 via numpy;
full PNG via stdlib zlib — every depth/color type/filter/interlace;
baseline JPEG via ``multimodal.jpeg``; nearest-neighbor resize; numpy
audio features) — use ``DecodeAudio`` / ``DecodeImage`` there. VIDEO:
Motion-JPEG in RIFF/AVI decodes for real (``multimodal.video`` — pure
container walk + the from-scratch JPEG decoder; ``SampleVideoFrames``
below is the actor-pool stage, decoding ONLY the planned frames).
Interframe codecs (H.264 etc.) need a C library and stay behind the
``UnsupportedMediaError`` seam by design:

- ``DecodeImageStub`` raises ``NotImplementedError`` at the exact seam
  where a real decoder (e.g. Pillow / torchvision / pyAV) would plug in;
- ``FakeFeatureExtractor`` is the deterministic stand-in used by tests and
  downstream stages (it hashes the payload into a fixed-size float vector,
  preserving the batch/actor/schema behavior of a real model).

Batch-size guidance: payloads are large, so these stages run with SMALL
``batch_size`` (rows) and rely on ``target_max_block_size`` to keep blocks
bounded — a 100-row batch of 5 MB images is already 500 MB of heap.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

BINARY_META_FIELDS = [
    ("media_type", pa.string()),  # "image/png", "audio/wav", ...
    ("byte_size", pa.int64()),
    ("payload_sha256", pa.string()),
]


def with_binary_metadata(table: pa.Table, payload_col: str = "payload") -> pa.Table:
    """Derive typed metadata columns from an opaque binary column."""
    from arlas_proc_ray.functions.hashing import sha256_hex

    payload = table.column(payload_col)
    size = pc.cast(pc.binary_length(payload), pa.int64())
    if pa.types.is_string(payload.type) or pa.types.is_large_string(payload.type):
        sha = sha256_hex(payload)
    else:
        sha = _binary_sha(payload)
    table = table.append_column("byte_size", size)
    if "payload_sha256" not in table.column_names:
        table = table.append_column("payload_sha256", sha)
    return table


def _binary_sha(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    out = []
    for c in chunks:
        out.extend(
            hashlib.sha256(v.as_py()).hexdigest() if v.is_valid else None for v in c
        )
    return pa.array(out, type=pa.string())


class DecodeImageStub:
    """Actor-pool decode stage — the seam for a real image decoder.

    __init__ is where a real implementation loads the codec / model once
    per actor. __call__ receives small pyarrow batches of (id, payload)
    and must emit decoded tensors. STUB: raises NotImplementedError.
    """

    def __init__(self, target_size: tuple[int, int] = (224, 224)):
        self.target_size = target_size

    def __call__(self, batch: pa.Table) -> pa.Table:
        raise NotImplementedError(
            "image decode requires an image library (Pillow/cv2) which is "
            "not available in this environment; plug a decoder in here"
        )


class FakeFeatureExtractor:
    """Deterministic stand-in for a per-payload embedding model.

    Hashes each payload into a ``dim``-float unit vector. Exercises the
    real actor-pool path: state in __init__, vectorized batch work,
    list<float> output column.
    """

    def __init__(self, dim: int = 16, payload_col: str = "payload"):
        self.dim = dim
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = []
        for v in batch.column(self.payload_col):
            if not v.is_valid:
                vecs.append(None)
                continue
            raw = v.as_py()
            if isinstance(raw, str):
                raw = raw.encode()
            digest = hashlib.sha256(raw).digest()
            need = self.dim * 4
            buf = (digest * (need // len(digest) + 1))[:need]
            vec = np.frombuffer(buf, dtype=np.uint32).astype(np.float64)
            vec = vec / np.linalg.norm(vec)
            vecs.append(vec.astype(np.float32).tolist())
        return batch.append_column(
            "features", pa.array(vecs, type=pa.list_(pa.float32()))
        )


class SampleVideoFrames:
    """Actor-pool stage: MJPEG/AVI payloads → one row per SAMPLED frame.

    Per input row (id, payload): read fps from the container, plan the
    sample indices with :func:`frame_sample_plan` (every ``every_s``
    seconds), then decode ONLY those frames (``multimodal.video``
    prunes at the demux — entropy decode cost is O(sampled), not
    O(duration)). Emits (id, frame_index, height, width, channels,
    mean_intensity, thumb) with ``thumb`` a flattened uint8
    ``target_size`` tensor — the same output layout as ``DecodeImage``
    plus the frame index, so downstream feature stages are shared.

    Scale: one actor decodes one video row at a time; size
    ``batch_size`` small (payloads are large) and ``concurrency`` to
    the node. Setup (nothing heavy here, but the seam where a real
    codec context would load) happens once per actor in ``__init__``.
    """

    def __init__(self, every_s: float = 1.0,
                 target_size: tuple[int, int] = (8, 8),
                 payload_col: str = "payload", id_col: str = "doc_id"):
        from arlas_proc_ray.multimodal.codecs import resize_nearest

        self.every_s = float(every_s)
        self.target_size = tuple(target_size)
        self.payload_col = payload_col
        self.id_col = id_col
        self._resize = resize_nearest

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        from arlas_proc_ray.multimodal.video import (
            avi_frame_rate,
            decode_avi_mjpeg,
            iter_frame_payloads,
        )

        ids, idxs, hs, ws, cs, means, thumbs = [], [], [], [], [], [], []
        for rid, v in zip(
            batch.column(self.id_col).to_pylist(),
            batch.column(self.payload_col),
        ):
            if not v.is_valid:
                continue
            payload = v.as_py()
            fps = avi_frame_rate(payload)
            n_frames = sum(1 for _ in iter_frame_payloads(payload))
            duration = n_frames / fps
            plan = frame_sample_plan(duration, fps, self.every_s)
            frames = decode_avi_mjpeg(payload, frame_indices=plan)
            for fi, img in zip(plan, frames):
                if img.ndim == 2:
                    img = img[:, :, None]
                ids.append(rid)
                idxs.append(int(fi))
                hs.append(img.shape[0])
                ws.append(img.shape[1])
                cs.append(img.shape[2])
                means.append(float(img.mean()))
                thumbs.append(
                    self._resize(img, self.target_size).ravel().tolist()
                )
        return pd.DataFrame(
            {
                self.id_col: pd.Series(ids, dtype=object),
                "frame_index": pd.Series(idxs, dtype="int64"),
                "height": pd.Series(hs, dtype="int64"),
                "width": pd.Series(ws, dtype="int64"),
                "channels": pd.Series(cs, dtype="int64"),
                "mean_intensity": pd.Series(means, dtype="float64"),
                "thumb": pd.Series(thumbs, dtype=object),
            }
        )


def frame_sample_plan(duration_s: float, fps: float, every_s: float) -> np.ndarray:
    """Frame indices to sample from a video every ``every_s`` seconds.

    Pure planning kernel (no decode): the real pipeline flat_maps each
    video row into one row per sampled frame index, then decodes those
    frames in the actor-pool stage.
    """
    if duration_s <= 0 or fps <= 0:
        return np.array([], dtype=np.int64)
    times = np.arange(0.0, duration_s, every_s)
    return np.minimum((times * fps).astype(np.int64), int(duration_s * fps) - 1)
