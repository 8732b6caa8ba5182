"""Exact character-n-gram Jaccard near-duplicate pairs.

The EXACT member of the dedup family (MinHash-LSH approximates exactly
this contract): every unordered document pair whose distinct-shingle
Jaccard similarity meets the threshold, computed with an inverted-index
exchange — no driver state, no all-pairs matmul:

    docs ──shingle──▶ (doc, shingle, |shingles(doc)|)      [map_batches]
        ──groupby(shingle)──▶ co-occurring doc pairs        [exchange 1]
        ──groupby(doc_a, doc_b)──▶ Σ co-occurrences = |A∩B| [exchange 2]
        jaccard = i / (|A| + |B| − i)  ≥ threshold

Each document's distinct-shingle count rides along with its posting rows,
so no sizes side-table or join is needed. Cost is Σ|posting list|² over
shingles — the standard inverted-index bound; the ``max_postings``
stop-shingle cap bounds the quadratic term on pathological shingles.
Dropping a shingle shared by more than ``max_postings`` docs can only
LOWER intersections (recall-reducing, never unsound); the default cap is
high enough that nothing is dropped at catalog scale, so the SQL oracle
(which has no cap) still matches hash-exactly.

At 100 TB the shingle strings themselves would be hashed to int64 before
the exchange (8-byte keys instead of n-byte strings); kept as raw strings
here so the result is byte-exactly reproducible by the DuckDB oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from arlas_proc_ray.stages.keyed import keyed_partition_map


def distinct_shingles(text: str, n: int) -> list[str]:
    """Distinct character n-grams; texts shorter than ``n`` shingle whole.

    (Shared definition with the SQL oracle: substr windows of length n,
    one window of the full text when len(text) < n; '' has one empty
    shingle.)
    """
    t = text or ""
    if len(t) < n:
        return [t]
    return list({t[i : i + n] for i in range(len(t) - n + 1)})


def ngram_jaccard_pairs(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    threshold: float = 0.2,
    num_partitions: int = 16,
    max_postings: int = 10_000,
):
    """Exact Jaccard pairs (doc_a < doc_b, jaccard ≥ threshold)."""

    def shingle(batch: pa.Table) -> pd.DataFrame:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        texts = batch.column(text_col).to_pylist()
        all_sh = [distinct_shingles(t, n) for t in texts]
        lens = np.fromiter((len(s) for s in all_sh), np.int64, count=len(texts))
        return pd.DataFrame(
            {
                "s": [sh for row in all_sh for sh in row],
                "doc": np.repeat(ids, lens),
                "nsh": np.repeat(lens, lens),
            }
        )

    postings = ds.map_batches(shingle, batch_format="pyarrow", batch_size=None)

    def emit_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        # sorted by (s, doc): contiguous posting lists
        svals = pdf["s"].to_numpy()
        bounds = np.flatnonzero(svals[1:] != svals[:-1]) + 1
        starts = np.concatenate([[0], bounds]) if len(pdf) else np.array([], np.int64)
        ends = (
            np.concatenate([bounds, [len(pdf)]]) if len(pdf) else np.array([], np.int64)
        )
        docs = pdf["doc"].to_numpy()
        nsh = pdf["nsh"].to_numpy()
        outs = []
        sizes = ends - starts
        # singleton shingles dominate — skip them without a Python iteration
        qual = np.flatnonzero((sizes >= 2) & (sizes <= max_postings))
        for qi in qual:
            s0, e0 = starts[qi], ends[qi]
            k = e0 - s0
            r, c = np.triu_indices(k, 1)
            outs.append(
                pd.DataFrame(
                    {
                        "doc_a": docs[s0:e0][r],
                        "doc_b": docs[s0:e0][c],
                        "na": nsh[s0:e0][r],
                        "nb": nsh[s0:e0][c],
                    }
                )
            )
        if not outs:
            return pd.DataFrame(
                {
                    c: pd.Series([], dtype=np.int64)
                    for c in ("doc_a", "doc_b", "na", "nb")
                }
            )
        return pd.concat(outs, ignore_index=True)

    pairs = keyed_partition_map(
        postings, keys=["s"], order_col="doc", fn=emit_pairs,
        num_partitions=num_partitions,
    )

    def reduce_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.groupby(["doc_a", "doc_b"], as_index=False, sort=False).agg(
            i=("na", "size"), na=("na", "first"), nb=("nb", "first")
        )
        # one double division of exactly-representable ints — bit-identical
        # to the SQL oracle with NO rounding (numpy round is half-even,
        # DuckDB's is half-up; rounding would diverge, raw division not)
        jac = g["i"].to_numpy(np.float64) / (
            g["na"].to_numpy(np.float64)
            + g["nb"].to_numpy(np.float64)
            - g["i"].to_numpy(np.float64)
        )
        g["jaccard"] = jac
        g = g[jac >= threshold]
        return g[["doc_a", "doc_b", "jaccard"]]

    return keyed_partition_map(
        pairs, keys=["doc_a", "doc_b"], order_col="doc_a", fn=reduce_pairs,
        num_partitions=max(4, num_partitions // 2),
    )
