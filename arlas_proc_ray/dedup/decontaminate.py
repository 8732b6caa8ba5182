"""Benchmark decontamination: flag documents sharing any n-gram with a
benchmark/eval set (the published n-gram-overlap decontamination rule used
by GPT-3/PaLM-style training-data pipelines, typically n = 13).

Shape: the benchmark side is SMALL by definition (eval sets), so a
digest of its distinct character n-gram windows is broadcast once
(``ray.put``); each corpus batch checks its own windows against the
broadcast — one stateless ``map_batches``, the corpus never shuffles.

Three broadcast representations (``mode=``):

* ``"exact"``   — the raw window STRINGS. Byte-exactly reproducible by
  the DuckDB oracle; payload ~n bytes per window. Right for real eval
  sets (MBs); wrong for a mislabeled multi-GB "benchmark".
* ``"hashed"``  — 8-byte Karp-Rabin hashes of the windows (over code
  points, so hash windows correspond 1:1 to the exact mode's character
  n-grams). Payload = 8 B/window regardless of n; false positives only
  on 64-bit hash collisions (~|corpus windows|·|bench|/2^64 expected).
* ``"bloom"``   — a Bloom filter over those hashes (Kirsch-Mitzenmacher
  double hashing, same scheme as stages/bloom.py). Payload =
  ``num_bits/8`` bytes total; false-positive rate the standard
  ``(1 − e^{−kn/m})^k`` (defaults m = 16 bits/window rounded up to a
  power of two, k = 8 → ≈ 5.7e-4). Flags are a SUPERSET of exact's.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from arlas_proc_ray.functions.text import _char_window_hashes


def ngram_windows(text: str, n: int) -> set[str]:
    """All character n-gram windows; texts shorter than n have NONE
    (shared definition with the SQL oracle — no whole-text fallback:
    a 5-char doc cannot collide on a 13-gram)."""
    t = text or ""
    return {t[i : i + n] for i in range(len(t) - n + 1)}


def _bench_hashes(benchmark_texts, n: int) -> np.ndarray:
    parts = [_char_window_hashes(t, n) for t in benchmark_texts]
    parts = [p for p in parts if len(p)]
    if not parts:
        return np.empty(0, dtype=np.uint64)
    return np.unique(np.concatenate(parts))


def _bloom_positions(hv: np.ndarray, num_bits: int, num_hashes: int):
    """Kirsch-Mitzenmacher double hashing over the 64-bit window hash
    (same scheme as stages/bloom.py): pos_i = (h1 + i·h2) mod m with odd
    h2, coprime with the power-of-two m."""
    m = np.uint64(num_bits)
    h1 = hv % m
    h2 = (hv // m) % m | np.uint64(1)
    return [(h1 + np.uint64(i) * h2) % m for i in range(num_hashes)]


def benchmark_window_payload(
    benchmark_texts, n: int, mode: str, *,
    num_bits: int | None = None, num_hashes: int = 8,
):
    """The driver-built broadcast payload for ``mode`` and its size in
    bytes — exposed so callers (and tests) can reason about broadcast
    cost before shipping it."""
    if mode == "exact":
        bench = set()
        for t in benchmark_texts:
            bench |= ngram_windows(t, n)
        # python string objects dominate; count the character payload
        return bench, sum(len(w) for w in bench) * 4
    hv = _bench_hashes(benchmark_texts, n)
    if mode == "hashed":
        return hv, hv.nbytes
    if mode == "bloom":
        if num_bits is None:
            num_bits = max(64, 1 << int(np.ceil(np.log2(16 * max(len(hv), 1)))))
        assert num_bits & (num_bits - 1) == 0, "num_bits must be a power of two"
        bm = np.zeros(num_bits // 8, dtype=np.uint8)
        for pos in _bloom_positions(hv, num_bits, num_hashes):
            np.bitwise_or.at(
                bm, (pos >> np.uint64(3)).astype(np.int64),
                np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8),
            )
        return (bm, num_bits, num_hashes), bm.nbytes
    raise ValueError(f"unknown mode: {mode!r}")


def decontaminate(
    ds,
    benchmark_texts,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    flag_col: str = "contaminated",
    mode: str = "exact",
    num_bits: int | None = None,
    num_hashes: int = 8,
):
    """Append a boolean ``contaminated`` column (any shared n-gram).

    ``mode``: broadcast representation — ``"exact"`` (strings, oracle-
    reproducible), ``"hashed"`` (8 B/window), ``"bloom"`` (bitmap,
    superset flags within the documented FP rate). See module docstring.
    """
    payload, _nbytes = benchmark_window_payload(
        benchmark_texts, n, mode, num_bits=num_bits, num_hashes=num_hashes
    )
    payload_ref = ray.put(payload)

    def _ids(batch: pa.Table) -> np.ndarray:
        return batch.column(id_col).to_numpy(zero_copy_only=False)

    if mode == "exact":

        def flag(batch: pa.Table) -> pd.DataFrame:
            bw = ray.get(payload_ref)
            texts = batch.column(text_col).to_pylist()
            hits = np.fromiter(
                (
                    any(
                        (t or "")[i : i + n] in bw
                        for i in range(len(t or "") - n + 1)
                    )
                    for t in texts
                ),
                dtype=bool,
                count=len(texts),
            )
            return pd.DataFrame({id_col: _ids(batch), flag_col: hits})

    else:

        def _batch_windows(texts):
            """Concat of per-doc window hashes + parallel doc indices."""
            hs, idx = [], []
            for j, t in enumerate(texts):
                h = _char_window_hashes(t, n)
                if len(h):
                    hs.append(h)
                    idx.append(np.full(len(h), j, dtype=np.int64))
            if not hs:
                return (
                    np.empty(0, np.uint64),
                    np.empty(0, np.int64),
                )
            return np.concatenate(hs), np.concatenate(idx)

        if mode == "hashed":

            def flag(batch: pa.Table) -> pd.DataFrame:
                bench = ray.get(payload_ref)  # plasma-local after batch 1
                texts = batch.column(text_col).to_pylist()
                H, D = _batch_windows(texts)
                hits = np.zeros(len(texts), dtype=bool)
                if len(H) and len(bench):
                    pos = np.searchsorted(bench, H)
                    pos[pos >= len(bench)] = len(bench) - 1
                    m = bench[pos] == H
                    if m.any():
                        hits[np.unique(D[m])] = True
                return pd.DataFrame({id_col: _ids(batch), flag_col: hits})

        else:  # bloom

            def flag(batch: pa.Table) -> pd.DataFrame:
                bm, nbits, k = ray.get(payload_ref)
                texts = batch.column(text_col).to_pylist()
                H, D = _batch_windows(texts)
                hits = np.zeros(len(texts), dtype=bool)
                if len(H):
                    m = np.ones(len(H), dtype=bool)
                    for pos in _bloom_positions(H, nbits, k):
                        byte = bm[(pos >> np.uint64(3)).astype(np.int64)]
                        bit = np.uint8(1) << (pos & np.uint64(7)).astype(
                            np.uint8
                        )
                        m &= (byte & bit) != 0
                    if m.any():
                        hits[np.unique(D[m])] = True
                return pd.DataFrame({id_col: _ids(batch), flag_col: hits})

    return ds.map_batches(flag, batch_format="pyarrow", batch_size=None)
