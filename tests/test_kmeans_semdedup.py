"""Independent Python oracles for distributed k-means and SemDeDup.

The catalog entries are rows-only (iterative algorithms have no SQL
equivalent); these tests replicate the EXACT algorithm single-threaded in
numpy on the full small table and assert equality — the same discipline
as tests/test_python_oracles.py.
"""

import hashlib

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _load():
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    x = np.stack([np.asarray(v, np.float64) for v in t.column("embedding").to_pylist()])
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    return ids, x


def _hash_rank(ids):
    return np.array(
        [int(hashlib.sha256(str(int(i)).encode()).hexdigest()[:15], 16) for i in ids],
        dtype=np.int64,
    )


def _reference_kmeans(ids, x, k=8, n_iter=5):
    order = np.argsort(_hash_rank(ids), kind="stable")[:k]
    c = x[order]
    for _ in range(n_iter):
        assign = np.argmax(x @ c.T, axis=1)
        new = c.copy()
        for cid in range(k):
            m = x[assign == cid]
            if len(m):
                new[cid] = m.mean(axis=0)
        norms = np.maximum(np.linalg.norm(new, axis=1, keepdims=True), 1e-12)
        c = new / norms
    return c, np.argmax(x @ c.T, axis=1)


@pytest.fixture(scope="module")
def reference():
    ids, x = _load()
    c, assign = _reference_kmeans(ids, x)
    return ids, x, c, assign


def test_distributed_kmeans_matches_reference(ray_session, reference):
    from arlas_proc_ray.ann.kmeans import distributed_kmeans
    from arlas_proc_ray.sources.io import read_parquet

    ids, x, c_ref, _ = reference
    ds = read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    c = distributed_kmeans(ds, k=8, n_iter=5)
    # partial sums are accumulated in a different order than the single-
    # threaded reference → allclose, not bit equality
    assert np.allclose(c, c_ref, atol=1e-9)


def test_kmeans_cluster_sizes(ray_session, reference):
    import __ray_entry__ as entry_mod

    ids, x, c_ref, assign_ref = reference
    got = entry_mod.queries()["kmeans_clusters"](SF)
    want = (
        pd.Series(assign_ref).value_counts().rename_axis("cluster")
        .reset_index(name="n_members").sort_values("cluster")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True).astype({"cluster": np.int64, "n_members": np.int64}),
        want.astype({"cluster": np.int64, "n_members": np.int64}),
    )


def test_semdedup_matches_reference(ray_session, reference):
    import __ray_entry__ as entry_mod

    ids, x, c_ref, assign_ref = reference
    got = (
        entry_mod.queries()["semdedup"](SF)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )

    thr = 0.4
    rows = []
    for cid in np.unique(assign_ref):
        members = np.flatnonzero(assign_ref == cid)
        members = members[np.argsort(ids[members], kind="stable")]
        kept_rows = []
        for i in members:
            keep = (not kept_rows) or float((x[kept_rows] @ x[i]).max()) < thr
            if keep:
                kept_rows.append(i)
            rows.append({"vec_id": int(ids[i]), "cluster": int(cid), "kept": keep})
    want = pd.DataFrame(rows).sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # greedy invariant: every dropped vector is ≥ thr-similar to some kept
    # vector of its cluster
    for cid in got["cluster"].unique():
        sub = got[got["cluster"] == cid]
        kept_ids = sub.loc[sub["kept"], "vec_id"].to_numpy()
        drop_ids = sub.loc[~sub["kept"], "vec_id"].to_numpy()
        if not len(drop_ids):
            continue
        pos = {int(v): j for j, v in enumerate(ids)}
        km = x[[pos[int(v)] for v in kept_ids]]
        dm = x[[pos[int(v)] for v in drop_ids]]
        assert ((dm @ km.T).max(axis=1) >= thr).all()
