"""Exact substring-duplication detection (shared L-char span pairs).

The training-data analogue of suffix-array substring dedup (Lee et al.
2022, "Deduplicating Training Data Makes Language Models Better"): find
document pairs that share at least one EXACT ``L``-byte substring. A true
distributed suffix array is overkill for the pair-discovery contract; the
equivalent windowed formulation is exact and embarrassingly parallel:

  docs ─map_batches(all L-byte window hashes, unique per doc)─▶
       rows (whash, doc_id)                       # |text| rows per doc
       ─keyed exchange on whash─▶ per-bucket pairs + partial pair counts
       ─keyed exchange on (doc_a, doc_b)─▶ n_shared_spans per pair

Window hashing reuses the vectorized Karp-Rabin all-window kernel
(functions/text.py); a 64-bit hash stands in for the span itself, so the
exchange carries 16-byte rows instead of L-byte strings (collision
probability ~2⁻⁶⁴ per bucket — negligible, and the SQL oracle confirms
equality at test scale). Documents shorter than ``L`` emit nothing.

Scale notes: the window rows are ~|corpus bytes| × 16 B — the same order
as a MinHash shingle pass — and the bucket exchange is the only wide
step. ``max_bucket_size`` (off by default: exact contract) bounds the
pair blow-up of degenerate spans (boilerplate headers shared by thousands
of docs) exactly like the MinHash band-bucket guard.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from arlas_proc_ray.functions.text import _all_window_hashes

_EMPTY = {
    "doc_a": pd.Series([], dtype=np.int64),
    "doc_b": pd.Series([], dtype=np.int64),
    "n_shared_spans": pd.Series([], dtype=np.int64),
}


def duplicated_span_pairs(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    length: int = 50,
    num_partitions: int = 16,
    max_bucket_size: int | None = None,
):
    """Pairs (doc_a < doc_b, n_shared_spans) sharing ≥1 exact L-byte span."""
    from arlas_proc_ray.stages.keyed import keyed_partition_map

    def window_rows(pdf: pd.DataFrame) -> pd.DataFrame:
        hashes, ids = [], []
        for i, t in zip(pdf[id_col], pdf[text_col]):
            if not t:
                continue
            raw = t.encode("utf-8", "ignore")
            if len(raw) < length:
                continue  # SQL contract: no windows for short docs
            h = np.unique(_all_window_hashes(raw, length))
            hashes.append(h)
            ids.append(np.full(len(h), i, dtype=np.int64))
        if not hashes:
            return pd.DataFrame(
                {"whash": pd.Series([], dtype=np.int64),
                 "doc_id": pd.Series([], dtype=np.int64)}
            )
        return pd.DataFrame(
            {
                "whash": np.concatenate(hashes).view(np.int64),
                "doc_id": np.concatenate(ids),
            }
        )

    rows = ds.select_columns([id_col, text_col]).map_batches(
        window_rows, batch_format="pandas"
    , batch_size=None)

    def bucket_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        """Per-bucket pairs, then a partial per-pair count (combiner)."""
        codes, _ = pd.factorize(pdf["whash"], use_na_sentinel=False)
        order = np.argsort(codes, kind="stable")
        ids_s = pdf["doc_id"].to_numpy()[order]
        codes_s = codes[order]
        bounds = np.flatnonzero(np.diff(codes_s)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(codes_s)]])
        a_parts, b_parts = [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            ids = np.unique(ids_s[s:e])
            if len(ids) < 2:
                continue
            if max_bucket_size is not None and len(ids) > max_bucket_size:
                ids = ids[:max_bucket_size]
            ia, ib = np.triu_indices(len(ids), k=1)
            a_parts.append(ids[ia])
            b_parts.append(ids[ib])
        if not a_parts:
            return pd.DataFrame(_EMPTY)
        out = pd.DataFrame(
            {"doc_a": np.concatenate(a_parts), "doc_b": np.concatenate(b_parts)}
        )
        return out.groupby(["doc_a", "doc_b"], as_index=False, sort=False).agg(
            n_shared_spans=("doc_a", "size")
        )

    partial = keyed_partition_map(
        rows, keys=["whash"], order_col="doc_id", fn=bucket_pairs,
        num_partitions=num_partitions,
    )

    def sum_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return pd.DataFrame(_EMPTY)
        return pdf.groupby(["doc_a", "doc_b"], as_index=False, sort=False)[
            "n_shared_spans"
        ].sum()

    return keyed_partition_map(
        partial, keys=["doc_a", "doc_b"], order_col="n_shared_spans",
        fn=sum_pairs, num_partitions=num_partitions,
    )
