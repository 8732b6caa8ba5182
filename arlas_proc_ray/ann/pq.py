"""Product quantization (PQ) ANN — the memory-compressed scale path.

Jégou, Douze & Schmid 2011 ("Product Quantization for Nearest Neighbor
Search"): split the d dimensions into ``m`` subspaces, k-means each one
(``k ≤ 256`` → one uint8 code per subspace), and store ``m`` BYTES per
vector instead of 4–8·d. Search is asymmetric distance computation
(ADC): per query, one (m × k) lookup table of squared sub-distances to
every sub-centroid; a database vector's distance is then the sum of m
table gathers over its codes — the float vectors are never read again.

At 100 TB this is the difference between an embedding index that fits
the cluster's RAM and one that does not (64-dim float32 = 256 B/vector
→ 8 B/vector at m=8): codes stream through ``map_batches`` as plain
binary columns, the codebooks broadcast once via ``ray.put``, per-block
top-k partials merge on the driver exactly like the brute-force path
(provably tiny: #queries × k rows per block).

Vectors are unit-normalized before encoding, so ADC L2 order equals
cosine order (‖a−b‖² = 2 − 2·cosθ on unit vectors) and the emitted
``cos_est = 1 − d²/2`` is directly comparable with the exact scorer —
recall against ``brute_force_topk`` is the test contract, as for the
LSH and IVF paths.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from arlas_proc_ray.ann.search import (
    _as_matrix,
    _merge_topk_partials,
    _normalize,
)


def _lloyd_l2(x: np.ndarray, k: int, *, n_iter: int = 12,
              seed: int = 17) -> np.ndarray:
    """Plain L2 Lloyd's k-means (subspace vectors are NOT re-normalized
    — cosine k-means would distort the residual geometry)."""
    rng = np.random.RandomState(seed)
    n = len(x)
    k = min(k, n)
    centroids = x[rng.choice(n, size=k, replace=False)].copy()
    for _ in range(n_iter):
        # ||x - c||² = ||x||² - 2 x·c + ||c||²; argmin drops ||x||²
        d2 = -2.0 * (x @ centroids.T) + (centroids**2).sum(axis=1)[None, :]
        assign = np.argmin(d2, axis=1)
        for c in range(k):
            members = x[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids


def train_pq(
    ds,
    *,
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 256,
    train_sample: int = 20_000,
    n_iter: int = 12,
    seed: int = 17,
) -> np.ndarray:
    """Codebooks (m, k, d/m) from a bounded driver-side sample (the same
    bounded-trainer contract as ``ivf.train_centroids``)."""
    if k > 256:
        raise ValueError("k > 256 does not fit a uint8 code")
    sample_rows = ds.limit(train_sample).to_pandas()
    sample = _normalize(
        np.stack([np.asarray(v, np.float64) for v in sample_rows[vec_col]])
    )
    d = sample.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    books = np.stack([
        _lloyd_l2(
            np.ascontiguousarray(sample[:, j * dsub:(j + 1) * dsub]),
            k, n_iter=n_iter, seed=seed + j,
        )
        for j in range(m)
    ])
    return books


def pq_encode(
    ds,
    codebooks: np.ndarray,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    code_col: str = "pq_code",
):
    """(id, m-byte binary code) Dataset — the compressed index rows."""
    books_ref = ray.put(np.asarray(codebooks, np.float64))
    m, k, dsub = codebooks.shape

    def encode(batch: pa.Table) -> pa.Table:
        books = ray.get(books_ref)
        x = _normalize(_as_matrix(batch.column(vec_col)))
        n = len(x)
        codes = np.empty((n, m), np.uint8)
        for j in range(m):
            sub = x[:, j * dsub:(j + 1) * dsub]
            c = books[j]
            d2 = -2.0 * (sub @ c.T) + (c**2).sum(axis=1)[None, :]
            codes[:, j] = np.argmin(d2, axis=1).astype(np.uint8)
        return pa.table({
            id_col: batch.column(id_col),
            code_col: pa.array(list(codes.tobytes()[i * m:(i + 1) * m]
                                    for i in range(n)), pa.binary()),
        })

    return ds.map_batches(encode, batch_format="pyarrow", batch_size=None)


def pq_topk(
    codes_ds,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    codebooks: np.ndarray,
    *,
    k: int = 3,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
) -> pd.DataFrame:
    """ADC top-k over the code rows: (query_id, vec_id, cos_est) with k
    rows per query, ties broken by ascending vec_id."""
    m, kc, dsub = codebooks.shape
    state_ref = ray.put({
        "ids": np.asarray(query_ids),
        "q": _normalize(np.asarray(query_matrix, np.float64)),
        "books": np.asarray(codebooks, np.float64),
    })

    def score(batch: pa.Table) -> pd.DataFrame:
        st = ray.get(state_ref)
        qids, qm, books = st["ids"], st["q"], st["books"]
        code_bytes = batch.column(code_col).combine_chunks()
        n = len(code_bytes)
        codes = np.frombuffer(
            b"".join(code_bytes.to_pylist()), np.uint8
        ).reshape(n, m)
        ids = batch.column(id_col).to_numpy()
        # per-query LUT: squared distance to every sub-centroid
        nq = len(qm)
        dists = np.zeros((nq, n))
        for j in range(m):
            sub_q = qm[:, j * dsub:(j + 1) * dsub]      # (nq, dsub)
            c = books[j]                                # (kc, dsub)
            lut = (
                (sub_q**2).sum(axis=1)[:, None]
                - 2.0 * (sub_q @ c.T)
                + (c**2).sum(axis=1)[None, :]
            )                                           # (nq, kc)
            dists += lut[:, codes[:, j]]                # gather → (nq, n)
        cos_est = 1.0 - dists / 2.0  # unit vectors: ‖a−b‖² = 2 − 2cos
        kk = min(k, n)
        top = np.argpartition(-cos_est, kth=kk - 1, axis=1)[:, :kk]
        return pd.DataFrame({
            "query_id": np.repeat(qids, kk),
            "vec_id": ids[top].ravel(),
            "cos_sim": np.take_along_axis(cos_est, top, axis=1).ravel(),
        })

    partials = codes_ds.map_batches(
        score, batch_format="pyarrow", batch_size=None
    )
    out = _merge_topk_partials(partials, k)
    return out.rename(columns={"cos_sim": "cos_est"})


# ------------------------------------------------------------------ IVF-PQ
def ivfpq_build(
    ds,
    *,
    vec_col: str = "embedding",
    n_centroids: int = 64,
    m: int = 8,
    k: int = 256,
    train_sample: int = 20_000,
    n_iter: int = 12,
    seed: int = 17,
) -> dict:
    """Coarse quantizer + RESIDUAL PQ codebooks (the IVFADC layout of
    Jégou 2011 §IV — the canonical billion-scale composition: the coarse
    centroid prunes the corpus, the PQ code refines the residual
    ``x − c(x)``, which is far better concentrated than x itself)."""
    from arlas_proc_ray.ann.ivf import kmeans_fit

    if k > 256:
        raise ValueError("k > 256 does not fit a uint8 code")
    sample_rows = ds.limit(train_sample).to_pandas()
    sample = _normalize(
        np.stack([np.asarray(v, np.float64) for v in sample_rows[vec_col]])
    )
    d = sample.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    centroids = kmeans_fit(sample, n_centroids, seed=seed)
    assign = np.argmax(sample @ centroids.T, axis=1)
    residuals = sample - centroids[assign]
    dsub = d // m
    books = np.stack([
        _lloyd_l2(
            np.ascontiguousarray(residuals[:, j * dsub:(j + 1) * dsub]),
            k, n_iter=n_iter, seed=seed + j,
        )
        for j in range(m)
    ])
    return {"centroids": centroids, "books": books}


def ivfpq_encode(
    ds,
    model: dict,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """(id, bucket, m-byte residual code) rows — the compressed index."""
    model_ref = ray.put({
        "centroids": np.asarray(model["centroids"], np.float64),
        "books": np.asarray(model["books"], np.float64),
    })
    m, kc, dsub = model["books"].shape

    def encode(batch: pa.Table) -> pa.Table:
        st = ray.get(model_ref)
        cents, books = st["centroids"], st["books"]
        x = _normalize(_as_matrix(batch.column(vec_col)))
        n = len(x)
        assign = np.argmax(x @ cents.T, axis=1)
        res = x - cents[assign]
        codes = np.empty((n, m), np.uint8)
        for j in range(m):
            sub = np.ascontiguousarray(res[:, j * dsub:(j + 1) * dsub])
            c = books[j]
            d2 = -2.0 * (sub @ c.T) + (c**2).sum(axis=1)[None, :]
            codes[:, j] = np.argmin(d2, axis=1).astype(np.uint8)
        buf = codes.tobytes()
        return pa.table({
            id_col: batch.column(id_col),
            "bucket": pa.array(assign.astype(np.int32), pa.int32()),
            "pq_code": pa.array(
                [buf[i * m:(i + 1) * m] for i in range(n)], pa.binary()
            ),
        })

    return ds.map_batches(encode, batch_format="pyarrow", batch_size=None)


def ivfpq_topk(
    codes_ds,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    model: dict,
    *,
    k: int = 3,
    n_probe: int = 8,
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """IVFADC search: probe ``n_probe`` coarse buckets per query, ADC on
    the residual codes inside them. (query_id, vec_id, cos_est), ≤k rows
    per query, deterministic tie-break."""
    books = np.asarray(model["books"], np.float64)
    cents = np.asarray(model["centroids"], np.float64)
    m, kc, dsub = books.shape
    qm = _normalize(np.asarray(query_matrix, np.float64))
    probe = min(n_probe, len(cents))
    qsims = qm @ cents.T
    probed = np.argpartition(-qsims, kth=probe - 1, axis=1)[:, :probe]

    state_ref = ray.put({
        "qids": np.asarray(query_ids), "qm": qm, "cents": cents,
        "books": books, "probed": probed,
    })

    def score(batch: pa.Table) -> pd.DataFrame:
        st = ray.get(state_ref)
        qids, qm_, cents_, books_ = (
            st["qids"], st["qm"], st["cents"], st["books"]
        )
        code_bytes = batch.column("pq_code").combine_chunks()
        n = len(code_bytes)
        codes = np.frombuffer(
            b"".join(code_bytes.to_pylist()), np.uint8
        ).reshape(n, m)
        buckets = batch.column("bucket").to_numpy()
        ids = batch.column(id_col).to_numpy()
        # bucket -> query positions probing it
        probing: dict[int, list[int]] = {}
        for qpos, cs in enumerate(st["probed"]):
            for c in cs:
                probing.setdefault(int(c), []).append(qpos)
        frames = []
        for c, qpos in probing.items():
            mask = buckets == c
            if not mask.any():
                continue
            sub_codes = codes[mask]
            sub_ids = ids[mask]
            qr = qm_[qpos] - cents_[c]  # query residual vs this centroid
            dists = np.zeros((len(qpos), len(sub_ids)))
            for j in range(m):
                sq = np.ascontiguousarray(qr[:, j * dsub:(j + 1) * dsub])
                cb = books_[j]
                lut = (
                    (sq**2).sum(axis=1)[:, None]
                    - 2.0 * (sq @ cb.T)
                    + (cb**2).sum(axis=1)[None, :]
                )
                dists += lut[:, sub_codes[:, j]]
            cos_est = 1.0 - dists / 2.0
            kk = min(k, cos_est.shape[1])
            top = np.argpartition(-cos_est, kth=kk - 1, axis=1)[:, :kk]
            frames.append(pd.DataFrame({
                "query_id": np.repeat(st["qids"][qpos], kk),
                "vec_id": sub_ids[top].ravel(),
                "cos_sim": np.take_along_axis(cos_est, top, axis=1).ravel(),
            }))
        if not frames:
            return pd.DataFrame({
                "query_id": pd.Series([], dtype=np.int64),
                "vec_id": pd.Series([], dtype=np.int64),
                "cos_sim": pd.Series([], dtype=np.float64),
            })
        return pd.concat(frames, ignore_index=True)

    partials = codes_ds.map_batches(
        score, batch_format="pyarrow", batch_size=None
    )
    out = _merge_topk_partials(partials, k)
    return out.rename(columns={"cos_sim": "cos_est"})
