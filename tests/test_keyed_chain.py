"""Fused keyed-operator chains: one shuffle, identical results."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from arlas_proc_ray.stages.keyed import keyed_partition_map, state_id_fn


def _fixture() -> pd.DataFrame:
    rng = np.random.RandomState(3)
    n = 2000
    return pd.DataFrame(
        {
            "id": rng.choice([f"k{i}" for i in range(40)], n),
            "seq": rng.permutation(n),
            "v": rng.randint(0, 5, n).astype(float),
        }
    )


def test_chain_matches_sequential():
    # closures (not module-level fns): workers can't import the test module
    def lag_fn(pdf):
        pdf["v_lag"] = pdf.groupby("id", sort=False)["v"].shift(1)
        return pdf

    def dur_fn(pdf):
        pdf["dv"] = pdf["v"] - pdf.groupby("id", sort=False)["v"].shift(1)
        return pdf

    def cum_fn(pdf):
        pdf["v_cum"] = pdf.groupby("id", sort=False)["v"].cumsum()
        return pdf

    df = _fixture()
    sid = state_id_fn(["id"], "seq", "v", "seg")
    fns = [lag_fn, dur_fn, cum_fn, sid]

    # exchange pinned to "sort": this test asserts the SORT-plan shape
    # (one Sort operator for the fused chain) — the process-wide default
    # may be "staged" when the catalog module was imported earlier in
    # the session (pipelines/queries.py opt-in)
    seq = rd.from_pandas(df)
    for f in fns:
        seq = keyed_partition_map(
            seq, keys=["id"], order_col="seq", fn=f, num_partitions=4,
            exchange="sort",
        )
    expected = (
        seq.to_pandas().sort_values(["id", "seq"]).reset_index(drop=True)
    )

    fused = keyed_partition_map(
        rd.from_pandas(df), keys=["id"], order_col="seq", chain=fns,
        num_partitions=4, exchange="sort",
    )
    got = fused.to_pandas().sort_values(["id", "seq"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[expected.columns], expected)

    # ONE shuffle in the fused plan (vs 4 sequentially)
    stats = fused.materialize().stats()
    sort_ops = [
        line
        for line in stats.splitlines()
        if line.startswith("Operator") and "Sort" in line
    ]
    assert len(sort_ops) == 1, stats


def test_chain_param_validation():
    ds = rd.from_pandas(_fixture())
    with pytest.raises(ValueError):
        keyed_partition_map(ds, keys=["id"], order_col="seq")
    with pytest.raises(ValueError):
        keyed_partition_map(
            ds, keys=["id"], order_col="seq",
            fn=lambda p: p, chain=[lambda p: p],
        )
