"""Distributed spherical k-means and SemDeDup-style semantic dedup.

``train_centroids`` (ann/ivf.py) fits on a bounded driver sample — right
for IVF index training. This module is the CORPUS-scale variant: every
vector participates in every Lloyd's iteration, and nothing vector-shaped
ever reaches the driver:

  per iteration:  centroids ──ray.put──▶ map_batches(assign + per-cluster
                  partial (count, Σvec))  ──▶  tiny (≤ blocks·k)-row reduce
                  on the driver (k·d floats)  ──▶  new centroids

The driver holds only the k×d centroid matrix — the classic broadcast-
combiner loop (one pass over the data per iteration, zero shuffles).

SemDeDup (Abbas et al. 2023): cluster the embeddings, then inside each
cluster greedily keep a vector only if its cosine similarity to every
already-kept vector of that cluster is below the threshold (iterating in
ascending id order — deterministic). Pairwise work is confined to one
cluster at a time via ONE keyed exchange on the cluster id; cluster size
is ~n/k, so pick ``n_clusters`` proportional to corpus size to bound the
per-partition quadratic term.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from arlas_proc_ray.ann.search import _normalize
from arlas_proc_ray.functions.hashing import sha256_prefix_int


def _batch_matrix(col) -> np.ndarray:
    return _normalize(np.stack([np.asarray(v, np.float64) for v in col]))


def _init_centroids(ds, *, vec_col: str, id_col: str, k: int) -> np.ndarray:
    """Deterministic seeds: the k vectors with the smallest sha256(id).

    Content-hash ranking is stable across reruns/partitionings (the same
    property the sampling/split operators rely on); a per-batch top-k
    combiner means only ≤ k rows per block reach the driver.
    """

    def partial(batch: pa.Table) -> pa.Table:
        h = sha256_prefix_int(pa.compute.cast(batch.column(id_col), pa.string()))
        order = np.argsort(h, kind="stable")[:k]
        return batch.take(pa.array(order)).append_column(
            "_hrank", pa.array(h[order], pa.int64())
        )

    top = (
        ds.select_columns([id_col, vec_col])
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .to_pandas()
        .sort_values("_hrank", kind="mergesort")
        .head(k)
    )
    return _batch_matrix(top[vec_col])


def distributed_kmeans(
    ds,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    n_iter: int = 5,
) -> np.ndarray:
    """Full-corpus spherical Lloyd's; returns the (k, d) unit centroids."""
    centroids = _init_centroids(ds, vec_col=vec_col, id_col=id_col, k=k)
    d = centroids.shape[1]
    vecs = ds.select_columns([vec_col])

    for _ in range(n_iter):
        ref = ray.put(centroids)

        def partial(pdf: pd.DataFrame) -> pd.DataFrame:
            c = ray.get(ref)
            x = _batch_matrix(pdf[vec_col])
            assign = np.argmax(x @ c.T, axis=1)
            rows = []
            for cid in np.unique(assign):
                m = x[assign == cid]
                rows.append(
                    {"cluster": int(cid), "n": len(m),
                     "vsum": m.sum(axis=0).tobytes()}
                )
            return pd.DataFrame(rows)

        parts = vecs.map_batches(partial, batch_format="pandas", batch_size=None).to_pandas()
        new = centroids.copy()
        for cid, grp in parts.groupby("cluster"):
            s = np.zeros(d)
            for b in grp["vsum"]:
                s += np.frombuffer(b, dtype=np.float64)
            new[int(cid)] = s / grp["n"].sum()
        centroids = _normalize(new)
    return centroids


def kmeans_assign(ds, centroids: np.ndarray, *, vec_col: str = "embedding",
                  target: str = "cluster"):
    """Attach the nearest-centroid id (stateless broadcast map)."""
    ref = ray.put(np.asarray(centroids, np.float64))

    def assign(pdf: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(ref)
        x = _batch_matrix(pdf[vec_col])
        pdf[target] = np.argmax(x @ c.T, axis=1).astype(np.int64)
        return pdf

    return ds.map_batches(assign, batch_format="pandas", batch_size=None)


def semdedup(
    ds,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
    n_clusters: int = 8,
    n_iter: int = 5,
    num_partitions: int = 8,
):
    """Semantic dedup: (id, cluster, kept) for every vector.

    ``kept`` is the greedy leader decision inside the vector's cluster
    (ascending id order): kept iff cos-sim to every previously-kept
    cluster member < ``threshold``.
    """
    from arlas_proc_ray.stages.keyed import keyed_partition_map

    centroids = distributed_kmeans(
        ds, vec_col=vec_col, id_col=id_col, k=n_clusters, n_iter=n_iter
    )
    assigned = kmeans_assign(ds.select_columns([id_col, vec_col]), centroids,
                             vec_col=vec_col)

    def leader(pdf: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for cid, grp in pdf.groupby("cluster", sort=False):
            x = _batch_matrix(grp[vec_col])
            kept = np.zeros(len(grp), dtype=bool)
            kept_rows: list[int] = []
            for i in range(len(grp)):
                if not kept_rows or (x[kept_rows] @ x[i]).max() < threshold:
                    kept[i] = True
                    kept_rows.append(i)
            outs.append(
                pd.DataFrame(
                    {
                        id_col: grp[id_col].to_numpy(),
                        "cluster": np.full(len(grp), cid, dtype=np.int64),
                        "kept": kept,
                    }
                )
            )
        if not outs:
            return pd.DataFrame(
                {id_col: pd.Series([], dtype=np.int64),
                 "cluster": pd.Series([], dtype=np.int64),
                 "kept": pd.Series([], dtype=bool)}
            )
        return pd.concat(outs, ignore_index=True)

    return keyed_partition_map(
        assigned, keys=["cluster"], order_col=id_col, fn=leader,
        num_partitions=num_partitions,
    )
