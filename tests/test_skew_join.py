"""Skew-safe equi-join (stages/joins.py:equi_join_skew_safe): exact
parity with the plain shuffled join on a severely skewed key, hot slice
actually detected, and the no-skew fallthrough."""

import numpy as np
import pandas as pd
import ray.data as rd

from arlas_proc_ray.stages.joins import equi_join, equi_join_skew_safe
from arlas_proc_ray.stages.salted import detect_hot_keys


def _skewed(n=20000, seed=13):
    rng = np.random.default_rng(seed)
    # key 0 holds ~60% of rows; 200 cold keys share the rest
    k = np.where(rng.random(n) < 0.6, 0, rng.integers(1, 201, n))
    left = pd.DataFrame({"k": k.astype(np.int64), "x": np.arange(n)})
    right = pd.DataFrame({"k": np.arange(0, 201, dtype=np.int64)})
    right["v"] = right["k"] * 3 + 7
    return left, right


def _canon(df):
    return (
        df.sort_values(["k", "x"]).reset_index(drop=True)[["k", "x", "v"]]
        .astype("int64")
    )


def test_parity_with_plain_equi_join():
    left, right = _skewed()
    lds = rd.from_pandas(left).repartition(6)
    rds = rd.from_pandas(right).repartition(2)
    got = equi_join_skew_safe(
        lds, rds, on=["k"], right_cols=["v"], num_partitions=8,
        hot_fraction=0.05,
    ).to_pandas()
    exp = equi_join(
        rd.from_pandas(left).repartition(6),
        rd.from_pandas(right).repartition(2),
        on=["k"], right_cols=["v"], how="inner", num_partitions=8,
    ).to_pandas()
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))
    # and the hot key really is detected (the split path actually ran)
    hot = detect_hot_keys(rd.from_pandas(left).repartition(6), ["k"],
                          min_fraction=0.05)
    assert hot["k"].tolist() == [0]


def test_no_hot_keys_falls_through():
    rng = np.random.default_rng(3)
    left = pd.DataFrame(
        {"k": rng.integers(0, 500, 5000).astype(np.int64), "x": np.arange(5000)}
    )
    right = pd.DataFrame({"k": np.arange(500, dtype=np.int64)})
    right["v"] = right["k"] + 1
    got = equi_join_skew_safe(
        rd.from_pandas(left).repartition(4),
        rd.from_pandas(right),
        on=["k"], right_cols=["v"], num_partitions=8, hot_fraction=0.05,
    ).to_pandas()
    exp = left.merge(right, on="k")
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))
