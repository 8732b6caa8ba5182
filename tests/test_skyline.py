"""stages/analytics.py:skyline — local-frontier combiner vs brute force."""

import numpy as np
import pandas as pd
import ray.data as rd

from arlas_proc_ray.stages.analytics import skyline


def _brute(pdf, dims):
    m = pdf[dims].to_numpy()
    keep = []
    for i in range(len(m)):
        ge = (m >= m[i]).all(axis=1)
        gt = (m > m[i]).any(axis=1)
        if not (ge & gt).any():
            keep.append(i)
    return pdf.iloc[keep]


def test_skyline_matches_brute_force(ray_session):
    rng = np.random.default_rng(13)
    for trial in range(4):
        n = int(rng.integers(5, 400))
        pdf = pd.DataFrame(
            {
                "id": np.arange(n, dtype=np.int64),
                "a": rng.integers(0, 20, n).astype(np.int64),
                "b": rng.integers(0, 20, n).astype(np.int64),
                "c": rng.integers(0, 20, n).astype(np.int64),
            }
        )
        ds = rd.from_pandas(pdf).repartition(3)
        got = (
            skyline(ds, dims=["a", "b", "c"], keep_cols=["id"])
            .sort_values("id")
            .reset_index(drop=True)
        )
        want = (
            _brute(pdf, ["a", "b", "c"])[["id", "a", "b", "c"]]
            .sort_values("id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want)


def test_skyline_keeps_equal_duplicates(ray_session):
    pdf = pd.DataFrame(
        {"id": [1, 2, 3], "a": [5, 5, 1], "b": [7, 7, 1]}
    )
    got = skyline(rd.from_pandas(pdf), dims=["a", "b"], keep_cols=["id"])
    assert sorted(got["id"].tolist()) == [1, 2]  # both maxima, dup kept
