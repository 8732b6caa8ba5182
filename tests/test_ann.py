import numpy as np
import pandas as pd
import ray.data as rd

from arlas_proc_ray.ann import brute_force_topk, lsh_bucketed_topk
from arlas_proc_ray.ann.ivf import ivf_topk, kmeans_fit


def _load(sf="/root/testdata/sf0.001"):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()[:5]
    mat = np.stack([np.asarray(v) for v in t.column("embedding").to_pylist()[:5]]).astype(
        np.float64
    )
    ds = rd.read_parquet(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    return ds, ids, mat


def test_brute_force_topk_exact_and_self_first():
    ds, ids, mat = _load()
    out = brute_force_topk(ds, ids, mat, k=3)
    assert len(out) == 15
    # a vector's nearest neighbour is itself (cos_sim 1.0)
    firsts = out.groupby("query_id").first()
    assert np.allclose(firsts["cos_sim"], 1.0)
    assert (firsts.index.values == firsts["vec_id"].values).all()


def test_kmeans_deterministic():
    rng = np.random.RandomState(0)
    x = rng.normal(size=(200, 16))
    c1 = kmeans_fit(x, 8, seed=5)
    c2 = kmeans_fit(x, 8, seed=5)
    np.testing.assert_array_equal(c1, c2)
    assert c1.shape == (8, 16)


def test_ivf_recall_against_brute_force():
    ds, ids, mat = _load()
    exact = brute_force_topk(ds, ids, mat, k=3)
    approx = ivf_topk(ds, ids, mat, k=3, n_centroids=16, n_probe=8)
    # recall@3 with half the centroids probed should be high; and probing
    # ALL centroids must be exactly brute force
    hits = 0
    for q in ids:
        e = set(exact[exact.query_id.eq(q)]["vec_id"])
        a = set(approx[approx.query_id.eq(q)]["vec_id"])
        hits += len(e & a)
    assert hits >= 10  # ≥ 2/3 recall on this tiny fixture

    full = ivf_topk(ds, ids, mat, k=3, n_centroids=16, n_probe=16)
    pd.testing.assert_frame_equal(
        full.round(9), exact.round(9), check_dtype=False
    )


def test_lsh_runs_and_is_subsetted():
    ds, ids, mat = _load()
    out = lsh_bucketed_topk(ds, ids, mat, k=3, bits=4)
    assert set(out.columns) == {"query_id", "vec_id", "cos_sim"}
    assert out.groupby("query_id").size().max() <= 3


def test_pq_recall_vs_brute(ray_session):
    """PQ/ADC top-k (ann/pq.py): 16-byte codes over the 64-dim corpus
    recover most of the exact top-10 (recall bound), and the cos_est
    error vs true cosine is small for the returned pairs."""
    import numpy as np
    import ray.data as rd

    from arlas_proc_ray.ann import brute_force_topk
    from arlas_proc_ray.ann.pq import pq_encode, pq_topk, train_pq

    ds = rd.read_parquet(
        "/root/testdata/sf0.001/embeddings.parquet",
        columns=["vec_id", "embedding"],
    ).materialize()
    rows = ds.limit(5).to_pandas()
    qids = rows["vec_id"].to_numpy()
    qmat = np.stack([np.asarray(v, np.float64) for v in rows["embedding"]])

    books = train_pq(ds, m=16, k=64, train_sample=500)
    assert books.shape == (16, 64, 4)
    codes = pq_encode(ds, books).materialize()
    assert codes.count() == ds.count()

    k = 10
    exact = brute_force_topk(ds, qids, qmat, k=k)
    approx = pq_topk(codes, qids, qmat, books, k=k)
    assert len(approx) == len(qids) * k

    recalls = []
    for q in qids:
        e = set(exact[exact["query_id"] == q]["vec_id"])
        a = set(approx[approx["query_id"] == q]["vec_id"])
        recalls.append(len(e & a) / k)
    assert np.mean(recalls) >= 0.6, recalls

    # each query's own vector codes to itself → cos_est ≈ 1 at rank 1
    top1 = approx.groupby("query_id").head(1)
    assert (top1["vec_id"].to_numpy() == np.sort(qids)[
        np.argsort(np.argsort(top1["query_id"].to_numpy()))
    ]).mean() >= 0.8 or (top1["cos_est"] > 0.95).all()


def test_pq_determinism_and_errors(ray_session):
    import numpy as np
    import pytest
    import ray.data as rd

    from arlas_proc_ray.ann.pq import pq_encode, pq_topk, train_pq

    ds = rd.read_parquet(
        "/root/testdata/sf0.001/embeddings.parquet",
        columns=["vec_id", "embedding"],
    ).materialize()
    b1 = train_pq(ds, m=8, k=16, train_sample=200)
    b2 = train_pq(ds, m=8, k=16, train_sample=200)
    np.testing.assert_array_equal(b1, b2)  # seeded: reproducible
    with pytest.raises(ValueError, match="divisible"):
        train_pq(ds, m=7)
    with pytest.raises(ValueError, match="uint8"):
        train_pq(ds, m=8, k=512)
    # repartition-invariant results
    rows = ds.limit(3).to_pandas()
    qids = rows["vec_id"].to_numpy()
    qmat = np.stack([np.asarray(v, np.float64) for v in rows["embedding"]])
    c1 = pq_topk(pq_encode(ds, b1).materialize(), qids, qmat, b1, k=5)
    c2 = pq_topk(
        pq_encode(ds.repartition(7), b1).materialize(), qids, qmat, b1, k=5
    )
    import pandas as pd

    pd.testing.assert_frame_equal(
        c1.reset_index(drop=True), c2.reset_index(drop=True)
    )


def test_ivfpq_recall_vs_brute(ray_session):
    """IVFADC (coarse quantizer + residual PQ): probing most buckets
    with 16-byte residual codes recovers the exact top-10 within a
    recall bound; fewer probes trade recall for work."""
    import numpy as np
    import ray.data as rd

    from arlas_proc_ray.ann import brute_force_topk
    from arlas_proc_ray.ann.pq import ivfpq_build, ivfpq_encode, ivfpq_topk

    ds = rd.read_parquet(
        "/root/testdata/sf0.001/embeddings.parquet",
        columns=["vec_id", "embedding"],
    ).materialize()
    rows = ds.limit(5).to_pandas()
    qids = rows["vec_id"].to_numpy()
    qmat = np.stack([np.asarray(v, np.float64) for v in rows["embedding"]])

    model = ivfpq_build(ds, n_centroids=16, m=32, k=64, train_sample=500)
    codes = ivfpq_encode(ds, model).materialize()
    assert codes.count() == ds.count()

    k = 10
    exact = brute_force_topk(ds, qids, qmat, k=k)
    # near-random embeddings are ANN-hostile; probing every bucket
    # isolates the residual-PQ accuracy itself (≈ flat PQ)
    wide = ivfpq_topk(codes, qids, qmat, model, k=k, n_probe=16)
    narrow = ivfpq_topk(codes, qids, qmat, model, k=k, n_probe=2)

    def recall(approx):
        rs = []
        for q in qids:
            e = set(exact[exact["query_id"] == q]["vec_id"])
            a = set(approx[approx["query_id"] == q]["vec_id"])
            rs.append(len(e & a) / k)
        return float(np.mean(rs))

    assert recall(wide) >= 0.7  # measured 0.84 at these parameters
    assert recall(wide) >= recall(narrow) - 1e-9  # probes only help
