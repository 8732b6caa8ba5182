"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images / audio / video are carried as Arrow ``binary`` columns with typed
metadata columns alongside. The decode/resize/feature-extract kernels are
actor-pool ``map_batches`` stages. REAL decoders live in
``multimodal.codecs`` (WAV via stdlib ``wave``; netpbm P5/P6 via numpy;
full PNG via stdlib zlib — every depth/color type/filter/interlace;
baseline JPEG via ``multimodal.jpeg``; nearest-neighbor resize; numpy
audio features) — use ``DecodeAudio`` / ``DecodeImage`` there. Formats
needing an external codec library (video formats) remain stubbed:

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
