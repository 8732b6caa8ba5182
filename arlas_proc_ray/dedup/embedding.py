"""Embedding-cosine near-duplicate detection (the dedup family's dense
cousin of MinHash: same pairs-above-threshold contract, vector space
instead of shingle space).

Two paths:

- ``embedding_near_duplicates`` (exact): the L2-normalized id+matrix of
  the whole table is assembled ONCE by a Ray task from the dataset's
  block refs (the driver holds only ObjectRefs) and broadcast through the
  object store; each batch does one numpy matmul (rows × corpusᵀ) and
  thresholds. Pairs are emitted only when ``row_id < other_id`` so every
  unordered pair appears exactly once with no dedup exchange. O(n²/P)
  compute per worker, O(n·d) broadcast — the right tool to ~10⁶ vectors
  (a 1M×256-f32 matrix is 1 GB in the object store, read zero-copy by
  every task).
- ``embedding_near_duplicates_ivf`` (scale path): k-means coarse
  quantizer (reusing ``ann.ivf``'s bounded-sample trainer), vectors
  bucketed by nearest centroid, exact pairs WITHIN each bucket via one
  ``keyed_partition_map`` — compute drops to Σ|bucket|², nothing is
  broadcast, and recall is governed by the quantizer like IVF search
  (a near-dup pair straddling two centroids is missed; at near-dup
  thresholds ≥0.8 that is rare because the two vectors are nearly
  colinear and quantize together).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

PAIR_COLUMNS = {
    "vec_a": np.int64,
    "vec_b": np.int64,
    "cos_sim": np.float64,
}


def _empty_pairs() -> pd.DataFrame:
    return pd.DataFrame(
        {c: pd.Series([], dtype=t) for c, t in PAIR_COLUMNS.items()}
    )


def _as_matrix(col) -> np.ndarray:
    from arlas_proc_ray.ann.search import _as_matrix as _m

    return _m(col)


def embedding_near_duplicates(
    ds,
    *,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_dp: int | None = 6,
):
    """Exact cosine near-dup pairs (vec_a < vec_b, cos_sim ≥ threshold)."""
    import pyarrow as pa
    import ray

    # Build the broadcast id+matrix INSIDE a Ray task from the dataset's
    # block refs — the driver only ever holds object refs, never the
    # concatenated corpus (the matrix still bounds this path to ~10⁶
    # vectors; past that use embedding_near_duplicates_ivf).
    @ray.remote
    def _build_corpus(*tables: pa.Table):
        ids = np.concatenate(
            [t.column(id_col).to_numpy(zero_copy_only=False) for t in tables]
        ).astype(np.int64)
        mat = np.concatenate(
            [_as_matrix(t.column(vec_col)) for t in tables]
        ).astype(np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
        return ids, mat

    block_refs = ds.select_columns([id_col, vec_col]).to_arrow_refs()
    corpus_ref = _build_corpus.remote(*block_refs)

    def find_pairs(batch: pa.Table) -> pd.DataFrame:
        c_ids, c_mat = ray.get(corpus_ref)
        b_ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        b_mat = _as_matrix(batch.column(vec_col)).astype(np.float64)
        b_mat /= np.maximum(np.linalg.norm(b_mat, axis=1, keepdims=True), 1e-30)
        sims = b_mat @ c_mat.T  # (batch, corpus)
        hit_r, hit_c = np.nonzero(
            (sims >= threshold) & (b_ids[:, None] < c_ids[None, :])
        )
        if len(hit_r) == 0:
            return _empty_pairs()
        s = sims[hit_r, hit_c]
        if round_dp is not None:
            s = s.round(round_dp)
        return pd.DataFrame(
            {"vec_a": b_ids[hit_r], "vec_b": c_ids[hit_c], "cos_sim": s}
        )

    return ds.select_columns([id_col, vec_col]).map_batches(
        find_pairs, batch_format="pyarrow", batch_size=None
    )


def embedding_near_duplicates_ivf(
    ds,
    *,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 64,
    n_probe: int = 2,
    round_dp: int | None = 6,
    num_partitions: int = 16,
):
    """Approximate near-dup pairs: exact cosine within k-means buckets.

    Multi-probe: each vector is replicated into its ``n_probe`` nearest
    buckets, which recovers pairs that straddle a centroid boundary (at
    2× row cost for n_probe=2). A pair sharing several probed buckets
    would be found in each; it is emitted only from the pair's MINIMUM
    common bucket (each row carries its probe list, so the rule is
    evaluated locally — no global dedup exchange).
    """
    import pyarrow as pa

    from arlas_proc_ray.ann.ivf import train_centroids
    from arlas_proc_ray.stages.keyed import keyed_partition_map

    centroids = train_centroids(ds, vec_col=vec_col, n_centroids=n_centroids)
    k_probe = min(n_probe, centroids.shape[0])

    def assign(batch: pa.Table) -> pd.DataFrame:
        b_ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        b_mat = _as_matrix(batch.column(vec_col)).astype(np.float64)
        b_mat /= np.maximum(np.linalg.norm(b_mat, axis=1, keepdims=True), 1e-30)
        sims = b_mat @ centroids.T
        probes = np.argsort(-sims, axis=1)[:, :k_probe].astype(np.int32)
        n = len(b_ids)
        return pd.DataFrame(
            {
                "bucket": probes.ravel(),
                "vid": np.repeat(b_ids, k_probe),
                "vec": [v.tobytes() for v in np.repeat(b_mat, k_probe, axis=0)],
                "probes": [probes[i // k_probe].tobytes() for i in range(n * k_probe)],
            }
        )

    assigned = ds.select_columns([id_col, vec_col]).map_batches(
        assign, batch_format="pyarrow", batch_size=None
    )

    def bucket_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for bucket, grp in pdf.groupby("bucket", sort=False):
            if len(grp) < 2:
                continue
            vids = grp["vid"].to_numpy(np.int64)
            m = np.stack(
                [np.frombuffer(b, dtype=np.float64) for b in grp["vec"]]
            )
            probe_sets = [
                frozenset(np.frombuffer(b, dtype=np.int32)) for b in grp["probes"]
            ]
            sims = m @ m.T
            r, c = np.nonzero(
                np.triu(sims >= threshold, k=1)
                & (vids[:, None] != vids[None, :])
            )
            if len(r) == 0:
                continue
            # canonical-bucket rule: emit only where this bucket is the
            # pair's minimum COMMON probed bucket
            keep = np.fromiter(
                (
                    min(probe_sets[i] & probe_sets[j]) == bucket
                    for i, j in zip(r, c)
                ),
                dtype=bool,
                count=len(r),
            )
            r, c = r[keep], c[keep]
            if len(r) == 0:
                continue
            a, b = vids[r], vids[c]
            lo, hi = np.minimum(a, b), np.maximum(a, b)
            s = sims[r, c]
            if round_dp is not None:
                s = s.round(round_dp)
            outs.append(pd.DataFrame({"vec_a": lo, "vec_b": hi, "cos_sim": s}))
        if not outs:
            return _empty_pairs()
        return pd.concat(outs, ignore_index=True).drop_duplicates(
            subset=["vec_a", "vec_b"]
        )

    return keyed_partition_map(
        assigned, keys=["bucket"], order_col="vid", fn=bucket_pairs,
        num_partitions=num_partitions,
    )
