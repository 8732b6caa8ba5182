"""Incremental view maintenance (cdc/ivm.py) vs an independent pandas
state-replay oracle: random streams with group-moving updates,
delete-then-reinsert, vanished groups, count-only mode."""

import numpy as np
import pandas as pd
import ray.data as rd

from arlas_proc_ray.cdc.ivm import incremental_agg_view


def _oracle(log: pd.DataFrame, value=True) -> pd.DataFrame:
    last = (
        log.sort_values(["repo", "path", "lsn"])
        .groupby(["repo", "path"], sort=False)
        .tail(1)
    )
    state = last.loc[last["op"] != "DELETE"]
    g = state.groupby("grp", sort=False)
    out = g.size().rename("n_live").reset_index()
    if value:
        out = out.merge(
            g["val"].sum().rename("value_sum").reset_index(), on="grp"
        )
    return out.sort_values("grp").reset_index(drop=True)


def _run(log: pd.DataFrame, value=True) -> pd.DataFrame:
    out = incremental_agg_view(
        rd.from_pandas(log),
        key=["repo", "path"],
        order_col="lsn",
        op_col="op",
        group_col="grp",
        value_col="val" if value else None,
        num_partitions=8,
    ).to_pandas()
    return out.sort_values("grp").reset_index(drop=True)


def _random_log(n=4000, keys=500, groups=7, seed=3) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    kidx = rng.integers(0, keys, n)
    return pd.DataFrame(
        {
            "repo": [f"r{k % 23}" for k in kidx],
            "path": [f"p{k}" for k in kidx],
            "lsn": np.arange(1, n + 1),
            "op": np.where(rng.random(n) < 0.2, "DELETE", "UPDATE"),
            "grp": [f"g{v}" for v in rng.integers(0, groups, n)],
            "val": rng.integers(0, 1000, n).astype("int64"),
        }
    )


def test_random_stream_matches_state_groupby():
    log = _random_log()
    got = _run(log)
    expect = _oracle(log)
    pd.testing.assert_frame_equal(
        got.astype({"n_live": "int64", "value_sum": "int64"}), expect
    )


def test_out_of_order_delivery_is_irrelevant():
    log = _random_log(seed=9)
    shuffled = log.sample(frac=1.0, random_state=1).reset_index(drop=True)
    pd.testing.assert_frame_equal(_run(shuffled), _run(log))


def test_delete_then_reinsert_and_vanished_group():
    log = pd.DataFrame(
        [
            ("a", "x", 1, "UPDATE", "g1", 10),
            ("a", "x", 2, "DELETE", "g1", 0),
            ("a", "x", 3, "UPDATE", "g2", 7),   # reinsert into ANOTHER group
            ("b", "y", 4, "UPDATE", "g3", 5),
            ("b", "y", 5, "DELETE", "g3", 0),   # g3 vanishes entirely
            ("c", "z", 6, "UPDATE", "g2", 1),
            ("c", "z", 7, "UPDATE", "g2", 2),   # in-group update: sum moves
        ],
        columns=["repo", "path", "lsn", "op", "grp", "val"],
    )
    got = _run(log)
    assert got["grp"].tolist() == ["g2"]
    assert got["n_live"].tolist() == [2]
    assert got["value_sum"].tolist() == [9]


def test_count_only_mode():
    log = _random_log(seed=21)
    got = _run(log, value=False)
    expect = _oracle(log, value=False)
    assert "value_sum" not in got.columns
    pd.testing.assert_frame_equal(got.astype({"n_live": "int64"}), expect)


def test_incremental_moment_view_equals_batch_covariance_of_final_state():
    import numpy as np

    from arlas_proc_ray.cdc.ivm import incremental_moment_view

    rng = np.random.default_rng(9)
    rows = []
    lsn = 0
    # churn: multiple updates per key, deletes, delete-then-reinsert
    for key in range(40):
        for _ in range(int(rng.integers(1, 6))):
            live = rng.random() > 0.25
            rows.append(
                (key % 7, f"t{key % 3}", lsn, live,
                 int(rng.integers(-50, 500)), int(rng.integers(0, 24)))
            )
            lsn += 1
    df = pd.DataFrame(
        rows, columns=["uid", "etype", "lsn", "_live", "d0", "d1"]
    )
    got = incremental_moment_view(
        rd.from_pandas(df).repartition(5),
        key=["uid", "etype"], order_col="lsn", live_col="_live",
        vec_cols=["d0", "d1"], num_partitions=3,
    )
    # batch oracle: covariance of the final LWW live state
    last = df.sort_values("lsn").groupby(["uid", "etype"]).tail(1)
    live = last[last["_live"]]
    V = live[["d0", "d1"]].to_numpy().astype(object)
    n = len(V)
    s = V.sum(axis=0)
    so = (V[:, :, None] * V[:, None, :]).sum(axis=0)
    for _, r in got.iterrows():
        i, j = int(r["i"]), int(r["j"])
        want = float(n * int(so[i, j]) - int(s[i]) * int(s[j])) / float(n * n)
        assert r["cov"] == want  # exact: retractions cancel bit-for-bit
    assert len(got) == 3  # 2x2 upper triangle


def test_incremental_moment_view_all_deleted_is_empty():
    from arlas_proc_ray.cdc.ivm import incremental_moment_view

    df = pd.DataFrame(
        {
            "uid": [1, 1, 2, 2],
            "etype": ["a"] * 4,
            "lsn": [0, 1, 2, 3],
            "_live": [True, False, True, False],
            "d0": [10, 0, 20, 0],
        }
    )
    got = incremental_moment_view(
        rd.from_pandas(df), key=["uid", "etype"], order_col="lsn",
        live_col="_live", vec_cols=["d0"], num_partitions=2,
    )
    assert got.empty
