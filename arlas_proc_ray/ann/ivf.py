"""IVF (inverted-file) approximate nearest neighbour — the corpus-scale path.

Classic two-level design (as in FAISS's IVF-Flat, public knowledge):

1. TRAIN (driver, once): k-means (Lloyd, seeded, few iterations) on a
   sample of the vectors → ``n_centroids`` coarse centroids, broadcast via
   ``ray.put``.
2. SEARCH (streaming, no shuffle): each batch assigns its vectors to their
   nearest centroid (one matmul), keeps only vectors falling in any
   query's ``n_probe`` closest centroids, scores those against the
   relevant queries, and emits batch-local top-k rows. A tiny per-query
   reduce merges partials — identical sink shape to the brute-force and
   LSH variants (ann/search.py).

Approximation: recall < 1 by construction; raise ``n_probe`` toward
``n_centroids`` to trade speed back for recall (n_probe == n_centroids is
exactly brute force).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from arlas_proc_ray.ann.search import _as_matrix, _normalize


def kmeans_fit(sample: np.ndarray, n_centroids: int, *, n_iter: int = 10,
               seed: int = 17) -> np.ndarray:
    """Seeded Lloyd's k-means on unit-normalized vectors (numpy only)."""
    x = _normalize(np.asarray(sample, np.float64))
    rng = np.random.RandomState(seed)
    n = len(x)
    k = min(n_centroids, n)
    centroids = x[rng.choice(n, size=k, replace=False)]
    for _ in range(n_iter):
        sims = x @ centroids.T  # cosine on unit vectors
        assign = np.argmax(sims, axis=1)
        for c in range(k):
            members = x[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = _normalize(centroids)
    return centroids


def ivf_topk(
    ds,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    *,
    k: int = 3,
    n_centroids: int = 64,
    n_probe: int = 8,
    train_sample: int = 20_000,
    seed: int = 17,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency: int = 2,
) -> pd.DataFrame:
    """Approximate cosine top-k per query via IVF probing.

    Returns (query_id, vec_id, cos_sim), ≤k rows per query, deterministic
    (seeded training, vec_id tie-break).
    """
    # --- train on a bounded sample (driver-side; counts, not payload) -----
    sample_rows = ds.limit(train_sample).to_pandas()
    sample = np.stack([np.asarray(v, np.float64) for v in sample_rows[vec_col]])
    centroids = kmeans_fit(sample, n_centroids, seed=seed)

    qmat = _normalize(np.asarray(query_matrix, np.float64))
    qsims = qmat @ centroids.T
    probe = min(n_probe, centroids.shape[0])
    probed = np.argpartition(-qsims, kth=probe - 1, axis=1)[:, :probe]

    state_ref = ray.put(
        {
            "centroids": centroids,
            "qids": np.asarray(query_ids),
            "qmat": qmat,
            "probed": probed,
        }
    )

    class IvfScorer:
        def __init__(self):
            st = ray.get(state_ref)
            self.centroids = st["centroids"]
            self.qids = st["qids"]
            self.qmat = st["qmat"]
            # centroid -> list of query positions probing it
            self.queries_of: dict[int, list[int]] = {}
            for qpos, cents in enumerate(st["probed"]):
                for c in cents:
                    self.queries_of.setdefault(int(c), []).append(qpos)

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            mat = _normalize(_as_matrix(batch.column(vec_col)))
            ids = batch.column(id_col).to_numpy()
            assign = np.argmax(mat @ self.centroids.T, axis=1)
            frames = []
            for c, qpos in self.queries_of.items():
                mask = assign == c
                if not mask.any():
                    continue
                sub, sub_ids = mat[mask], ids[mask]
                sims = self.qmat[qpos] @ sub.T
                kk = min(k, sims.shape[1])
                top = np.argpartition(-sims, kth=kk - 1, axis=1)[:, :kk]
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": np.repeat(self.qids[qpos], kk),
                            "vec_id": sub_ids[top].ravel(),
                            "cos_sim": np.take_along_axis(sims, top, axis=1).ravel(),
                        }
                    )
                )
            if not frames:
                return pd.DataFrame(
                    {
                        "query_id": pd.Series([], dtype=np.int64),
                        "vec_id": pd.Series([], dtype=np.int64),
                        "cos_sim": pd.Series([], dtype=np.float64),
                    }
                )
            return pd.concat(frames, ignore_index=True)

    from arlas_proc_ray.ann.search import _merge_topk_partials

    cache: dict = {}

    def score(batch: pa.Table) -> pd.DataFrame:
        scorer = cache.get("s")
        if scorer is None:
            scorer = cache["s"] = IvfScorer()
        return scorer(batch)

    partials = ds.map_batches(score, batch_format="pyarrow", batch_size=None)
    return _merge_topk_partials(partials, k)


def train_centroids(
    ds,
    *,
    vec_col: str = "embedding",
    n_centroids: int = 64,
    train_sample: int = 20_000,
    seed: int = 17,
) -> np.ndarray:
    """Bounded-sample k-means trainer (shared by IVF search and the
    embedding near-dup bucketing): only ``train_sample`` rows ever reach
    the driver, whatever the corpus size."""
    sample_rows = ds.limit(train_sample).to_pandas()
    sample = np.stack([np.asarray(v, np.float64) for v in sample_rows[vec_col]])
    return kmeans_fit(sample, n_centroids, seed=seed)
