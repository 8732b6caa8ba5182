"""Overlapping chunking (stages/chunking.py): window/stride coverage,
short docs, empty text, overlap reconstruction, and pure-Python parity."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from arlas_proc_ray.stages.chunking import chunk_documents, chunk_text_fn


def _py_chunks(text, window, stride):
    toks = text.split(" ")
    n = len(toks)
    n_chunks = 1 + max(0, -(-(n - window) // stride))
    out = []
    for i in range(n_chunks):
        seg = toks[i * stride : i * stride + window]
        out.append((i, " ".join(seg), len(seg)))
    return out


def test_matches_pure_python():
    rng = np.random.default_rng(4)
    texts = [
        " ".join(f"w{j}" for j in range(rng.integers(1, 40))) for _ in range(60)
    ] + ["", "single", "a  b"]  # empty + double-space edge
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    import pyarrow as pa

    got = (
        chunk_text_fn("doc_id", "text", 8, 5)(pa.Table.from_pandas(df))
        .to_pandas()
        .sort_values(["doc_id", "chunk_index"])
    )
    for doc_id, g in got.groupby("doc_id"):
        expect = _py_chunks(texts[doc_id], 8, 5)
        assert (
            list(zip(g["chunk_index"], g["chunk_text"], g["n_tokens"]))
            == expect
        ), doc_id


def test_every_token_covered_and_overlap_consistent():
    text = " ".join(f"t{i}" for i in range(100))
    df = pd.DataFrame({"doc_id": [1], "text": [text]})
    out = (
        chunk_documents(
            rd.from_pandas(df), id_col="doc_id", text_col="text",
            window=32, stride=24,
        )
        .to_pandas()
        .sort_values("chunk_index")
        .reset_index(drop=True)
    )
    toks = text.split(" ")
    seen = set()
    for _, r in out.iterrows():
        seg = r["chunk_text"].split(" ")
        start = r["chunk_index"] * 24
        assert seg == toks[start : start + 32]  # overlap regions identical
        seen.update(range(start, start + len(seg)))
    assert seen == set(range(100))  # no token dropped
    assert out["n_tokens"].iloc[:-1].eq(32).all()


def test_invalid_stride_rejected():
    with pytest.raises(ValueError):
        chunk_text_fn("doc_id", "text", 8, 0)
    with pytest.raises(ValueError):
        chunk_text_fn("doc_id", "text", 8, 9)
