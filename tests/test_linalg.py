"""stages/linalg.py — exact-integer covariance combiner and PCA
projection, against a brute-force big-int oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from arlas_proc_ray.stages.linalg import (
    embedding_covariance,
    pca_components,
    pca_project,
)

SCALE = 1_000_000


def _frame(n=120, d=6, seed=3):
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n, d))
    base[:, 1] = 2.5 * base[:, 0] + 0.1 * base[:, 1]  # correlated pair
    return pd.DataFrame(
        {"vec_id": np.arange(n), "embedding": [r.tolist() for r in
                                               base.astype(np.float32)]}
    )


def _oracle_sums(df):
    X = np.array(df["embedding"].tolist(), dtype=np.float64)
    Q = np.floor(X * SCALE).astype(object)  # big-int domain
    n = len(Q)
    s = Q.sum(axis=0)
    so = (Q[:, :, None] * Q[:, None, :]).sum(axis=0)
    return n, s, so


def test_covariance_matches_bigint_oracle_exactly():
    df = _frame()
    n, s, so = _oracle_sums(df)
    cov = (
        embedding_covariance(rd.from_pandas(df).repartition(5))
        .set_index(["i", "j"])["cov"]
    )
    d = len(s)
    assert len(cov) == d * (d + 1) // 2
    for i in range(d):
        for j in range(i, d):
            want = float(n * int(so[i, j]) - int(s[i]) * int(s[j])) / float(
                n * n
            )
            assert cov.loc[(i, j)] == want  # bit-exact, not allclose


def test_pca_projection_matches_numpy_oracle_and_sign_fix():
    df = _frame()
    n, s, so = _oracle_sums(df)
    d = len(s)
    covm = np.empty((d, d))
    for i in range(d):
        for j in range(d):
            covm[i, j] = float(
                n * int(so[min(i, j), max(i, j)]) - int(s[i]) * int(s[j])
            ) / float(n * n)
    evals, evecs = np.linalg.eigh(covm)
    order = np.argsort(evals)[::-1][:3]
    comps = evecs[:, order].T.copy()
    for r in range(3):
        m = np.argmax(np.abs(comps[r]))
        if comps[r, m] < 0:
            comps[r] = -comps[r]
    mean_q = np.array([float(x) / n for x in s])

    got_mean, got_comps, got_evals = pca_components(
        rd.from_pandas(df).repartition(4), k=3
    )
    assert np.array_equal(got_mean, mean_q)
    assert np.array_equal(got_comps, comps)
    # every component's largest-|loading| entry is positive (sign fix)
    for r in range(3):
        assert got_comps[r, np.argmax(np.abs(got_comps[r]))] > 0

    proj = (
        pca_project(rd.from_pandas(df).repartition(4), k=3)
        .to_pandas()
        .sort_values("vec_id")
    )
    Q = np.floor(np.array(df["embedding"].tolist(), np.float64) * SCALE)
    want = (Q - mean_q) @ comps.T
    got = np.vstack(proj["proj"].to_numpy())
    assert np.array_equal(got, want)


def test_first_component_captures_dominant_direction():
    df = _frame()
    _, comps, evals = pca_components(rd.from_pandas(df).repartition(3), k=2)
    # the correlated (x0, x1) plane dominates: top eigval well above rest
    assert evals[0] > 3 * evals[1]
    top = np.abs(comps[0])
    assert set(np.argsort(top)[-2:]) == {0, 1}


def test_covariance_partials_merge_across_block_layouts():
    df = _frame(n=90)
    a = embedding_covariance(rd.from_pandas(df).repartition(1))
    b = embedding_covariance(rd.from_pandas(df).repartition(9))
    pd.testing.assert_frame_equal(a, b)  # combiner is layout-invariant


def test_empty_blocks_do_not_poison_partials():
    """ADVICE r4: a post-filter empty block used to emit a (0,)-shaped
    svec that crashed the driver merge with a broadcast error. Empty
    blocks must contribute NO partial row, and results must equal the
    same data without the empty blocks — for covariance, PCA, and
    projection alike."""
    import pytest

    df = _frame(n=80)
    dense = rd.from_pandas(df).repartition(4)
    # over-partition then filter: several blocks end up completely empty
    holey = (
        rd.from_pandas(pd.concat([df, df.assign(vec_id=df.vec_id + 1000)]))
        .repartition(16)
        .filter(lambda r: r["vec_id"] < 1000)
    )
    pd.testing.assert_frame_equal(
        embedding_covariance(dense), embedding_covariance(holey)
    )
    m_a, c_a, e_a = pca_components(dense, k=3)
    m_b, c_b, e_b = pca_components(holey, k=3)
    assert np.array_equal(m_a, m_b) and np.array_equal(c_a, c_b)
    assert np.array_equal(e_a, e_b)
    proj = (
        pca_project(holey, k=2)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert len(proj) == 80 and all(len(p) == 2 for p in proj["proj"])

    # all-empty dataset: clean signalling, not a broadcast crash
    empty = rd.from_pandas(df).filter(lambda r: False)
    assert embedding_covariance(empty).empty
    with pytest.raises(ValueError, match="no vectors"):
        pca_components(empty)
