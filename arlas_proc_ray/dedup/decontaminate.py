"""Benchmark decontamination: flag documents sharing any n-gram with a
benchmark/eval set (the published n-gram-overlap decontamination rule used
by GPT-3/PaLM-style training-data pipelines, typically n = 13).

Shape: the benchmark side is SMALL by definition (eval sets), so its
distinct character n-gram windows are broadcast once (``ray.put``); each
corpus batch slides its own windows against the broadcast set — one
stateless ``map_batches``, the corpus never shuffles.

Scale note: at 100 TB the broadcast set would hold 8-byte window HASHES
(or a Bloom filter) instead of raw strings; raw strings are kept here so
the result is byte-exactly reproducible by the DuckDB oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def ngram_windows(text: str, n: int) -> set[str]:
    """All character n-gram windows; texts shorter than n have NONE
    (shared definition with the SQL oracle — no whole-text fallback:
    a 5-char doc cannot collide on a 13-gram)."""
    t = text or ""
    return {t[i : i + n] for i in range(len(t) - n + 1)}


def decontaminate(
    ds,
    benchmark_texts,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    flag_col: str = "contaminated",
):
    """Append a boolean ``contaminated`` column (any shared n-gram)."""
    bench = set()
    for t in benchmark_texts:
        bench |= ngram_windows(t, n)
    bench_ref = ray.put(bench)

    def flag(batch: pa.Table) -> pd.DataFrame:
        bw = ray.get(bench_ref)
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
        return pd.DataFrame(
            {
                id_col: batch.column(id_col).to_numpy(zero_copy_only=False),
                flag_col: hits,
            }
        )

    return ds.map_batches(flag, batch_format="pyarrow", batch_size=None)
