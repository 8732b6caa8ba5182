"""Overlapping document chunking — RAG / training-window preparation.

The explode-side sibling of the LLM sequence packer
(stages/packing.py-family, catalog ``sequence_packing``): split each
document into fixed-size token windows with overlap, keeping a stable
(doc_id, chunk_index) identity per chunk. The reference's nearest shape
is its trail splitter (transform/fragment run splitting,
stages/keyed.py:138), but chunking is stateless per row, so here it is
a pure embarrassingly-parallel ``map_batches`` — no keyed exchange at
any scale.

Fully vectorized ragged explode: one Arrow ``split_pattern``, then the
per-chunk token ranges are materialized with the standard
ragged-arange construction (repeat + cumsum — no Python loop over rows
or chunks), gathered with one ``take``, and re-joined with one
``binary_join``. Tokenization is a single-space split so DuckDB's
``string_split(text, ' ')`` reproduces chunks byte-exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def chunk_text_fn(
    id_col: str, text_col: str, window: int, stride: int
):
    if stride <= 0 or window <= 0 or stride > window:
        raise ValueError("need 0 < stride <= window")

    def chunk(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t.column(text_col), pattern=" ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = toks.values
        n = np.diff(offsets)
        # chunks start every `stride` tokens while they still add content;
        # integer math (floor division) matches the SQL oracle exactly
        n_chunks = 1 + np.maximum(0, (n - window + stride - 1) // stride)
        doc_rep = np.repeat(np.arange(len(n)), n_chunks)
        total_c = int(n_chunks.sum())
        chunk_i = (
            np.arange(total_c)
            - np.repeat(np.cumsum(n_chunks) - n_chunks, n_chunks)
        )
        start = chunk_i * stride
        length = np.minimum(start + window, n[doc_rep]) - start
        base = offsets[:-1][doc_rep] + start
        tot = int(length.sum())
        idx = (
            np.arange(tot)
            - np.repeat(np.cumsum(length) - length, length)
            + np.repeat(base, length)
        )
        taken = flat.take(pa.array(idx, type=pa.int64()))
        new_off = np.zeros(total_c + 1, dtype=np.int64)
        np.cumsum(length, out=new_off[1:])
        chunk_lists = pa.LargeListArray.from_arrays(
            pa.array(new_off, type=pa.int64()), pc.cast(taken, pa.large_string())
        )
        return pa.table(
            {
                id_col: t.column(id_col).take(pa.array(doc_rep)),
                "chunk_index": pa.array(chunk_i, type=pa.int64()),
                "chunk_text": pc.cast(
                    pc.binary_join(
                        chunk_lists, pa.scalar(" ", pa.large_string())
                    ),
                    pa.string(),
                ),
                "n_tokens": pa.array(length, type=pa.int64()),
            }
        )

    return chunk


def chunk_documents(
    ds, *, id_col: str, text_col: str, window: int = 256, stride: int = 192
):
    """Explode each document into overlapping ``window``-token chunks
    every ``stride`` tokens (single-space tokenization). Output: one row
    per (id, chunk_index) with the chunk text and its token count."""
    return ds.map_batches(
        chunk_text_fn(id_col, text_col, window, stride),
        batch_format="pyarrow",
        batch_size=None,
    )
