"""Distributed dense linear algebra over embedding columns — exact
integer covariance partials and PCA projection.

The reference (gisaia/ARLAS-proc) has no vector-analytics surface at
all; this extends the embedding family (ann/, dedup/embedding.py) with
the classic two-pass-free covariance/PCA shape every training-data
pipeline needs (feature whitening, dimensionality reduction before ANN,
matryoshka-style truncation studies).

Scale shape: the Gram/covariance accumulation is a PURE per-block
combiner — each block of N vectors collapses to ONE partial row
(sum vector, upper-triangle outer-product sums, count) inside
``map_batches``; partials are block-count-sized, so the driver sum is a
tree-collect-sized reduce, never a shuffle. The D×D solve (eigh) is
driver-side — D is the embedding width (vector payloads are wide-row,
narrow-column by contract), the same small-side rule as every broadcast
join here. Projection is one broadcast matmul per block.

Determinism: inputs are quantized ``floor(x · scale)`` int64 (floor, not
round — float round ties differ between numpy's half-even and SQL's
half-away; floor is identical everywhere), so every sum is EXACT integer
math reproducible bit-for-bit by a SQL oracle; covariance finalization
is a single division of exact big-ints. Eigendecomposition sign is fixed
per component (largest-|loading| entry made positive) so projections are
reproducible across runs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _quantized_block(batch: pa.Table, col: str, scale: int) -> np.ndarray:
    """(n, D) int64 matrix of floor(x·scale) from a fixed-width list column."""
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    if n == 0:
        return np.zeros((0, 0), dtype=np.int64)
    d = len(flat) // n
    return np.floor(flat * scale).astype(np.int64).reshape(n, d)


def covariance_partials(ds, *, col: str, scale: int = 1_000_000):
    """Per-block exact-integer covariance partials: one row per block
    with (n, sum-vector, full D² outer-product sums, flattened)."""

    def partial(batch: pa.Table) -> pa.Table:
        q = _quantized_block(batch, col, scale)
        n, d = q.shape
        if n == 0:
            # A post-filter / over-partitioned read can hand us an empty
            # block; its (0,)-shaped svec would poison the driver merge
            # (shape (0,) + shape (D,) broadcast error). Emit NO row —
            # an empty typed table keeps the partials schema stable.
            return pa.table(
                {
                    "n": pa.array([], pa.int64()),
                    "svec": pa.array([], pa.list_(pa.int64())),
                    "souter": pa.array([], pa.list_(pa.int64())),
                }
            )
        souter = q.T @ q  # int64-exact: |q|≤scale, n per block bounded
        svec = q.sum(axis=0)
        return pa.table(
            {
                "n": pa.array([n], pa.int64()),
                "svec": pa.array([svec.tolist()], pa.list_(pa.int64())),
                "souter": pa.array(
                    [souter.ravel().tolist()], pa.list_(pa.int64())
                ),
            }
        )

    return ds.map_batches(partial, batch_format="pyarrow", batch_size=None)


def _merged_sums(partials_pdf: pd.DataFrame):
    """Driver reduce of block partials in Python big-ints (block sums can
    exceed int64 when multiplied out in the finalization)."""
    n = int(partials_pdf["n"].sum())
    svec = None
    souter = None
    for sv, so in zip(partials_pdf["svec"], partials_pdf["souter"]):
        sv = np.asarray(sv, dtype=object)
        so = np.asarray(so, dtype=object)
        svec = sv if svec is None else svec + sv
        souter = so if souter is None else souter + so
    return n, svec, souter


def embedding_covariance(
    ds, *, col: str = "embedding", scale: int = 1_000_000
) -> pd.DataFrame:
    """Exact covariance matrix of the quantized embedding column, as
    tidy upper-triangle rows (i ≤ j): cov = (n·Σxy − Σx·Σy) / n² — one
    division of exact integers, bit-identical to a SQL oracle."""
    pdf = covariance_partials(ds, col=col, scale=scale).to_pandas()
    if pdf.empty or int(pdf["n"].sum()) == 0:
        return pd.DataFrame(columns=["i", "j", "cov"])
    n, svec, souter = _merged_sums(pdf)
    d = len(svec)
    ii, jj = np.triu_indices(d)
    num = [
        n * int(souter[i * d + j]) - int(svec[i]) * int(svec[j])
        for i, j in zip(ii, jj)
    ]
    den = float(n * n)
    return pd.DataFrame(
        {
            "i": ii.astype(np.int64),
            "j": jj.astype(np.int64),
            "cov": np.array([float(x) / den for x in num], dtype=np.float64),
        }
    )


def pca_components(
    ds, *, col: str = "embedding", k: int = 8, scale: int = 1_000_000
):
    """Top-k principal axes of the quantized embeddings: driver-side
    ``eigh`` on the exact D×D covariance (descending eigenvalue order,
    sign fixed so each component's largest-|loading| entry is positive).
    Returns (mean_q float64[D], components float64[k, D], eigvals[k])."""
    pdf = covariance_partials(ds, col=col, scale=scale).to_pandas()
    if pdf.empty:
        raise ValueError("pca_components: dataset has no vectors")
    n, svec, souter = _merged_sums(pdf)
    d = len(svec)
    den = float(n * n)
    cov = np.empty((d, d), dtype=np.float64)
    for i in range(d):
        for j in range(i, d):
            v = float(n * int(souter[i * d + j]) - int(svec[i]) * int(svec[j])) / den
            cov[i, j] = cov[j, i] = v
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T.copy()  # (k, d)
    for r in range(comps.shape[0]):
        m = np.argmax(np.abs(comps[r]))
        if comps[r, m] < 0:
            comps[r] = -comps[r]
    mean_q = np.array([float(x) / n for x in svec], dtype=np.float64)
    return mean_q, comps, evals[order]


def pca_project(
    ds,
    *,
    col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    scale: int = 1_000_000,
):
    """Project every embedding onto the top-k principal axes (centered,
    quantized domain). The (mean, components) pair is broadcast via
    ``ray.put`` once; projection is one numpy matmul per block."""
    import ray

    mean_q, comps, _ = pca_components(ds, col=col, k=k, scale=scale)
    ref = ray.put((mean_q, comps))

    def project(batch: pa.Table) -> pa.Table:
        m, c = ray.get(ref)
        q = _quantized_block(batch, col, scale).astype(np.float64)
        if q.shape[0] == 0:
            q = q.reshape(0, len(m))  # empty block: keep D for the matmul
        proj = (q - m) @ c.T  # (n, k)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "proj": pa.array(
                    proj.tolist(), pa.list_(pa.float64())
                ),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow", batch_size=None)
