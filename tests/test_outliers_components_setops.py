import numpy as np
import pandas as pd
import ray.data as rd

from arlas_proc_ray.dedup.components import _union_find, connected_components
from arlas_proc_ray.stages.outliers import (
    outliers_to_store_fn,
    with_geo_distance_m,
    with_outlier_propagated,
    without_identified_outliers,
)
from arlas_proc_ray.stages.setops import distinct, except_keys, intersect_keys, union_all
from arlas_proc_ray.stages.summarize import conditional_collapse


def test_without_identified_outliers():
    df = pd.DataFrame({"v": [1.0, 2.0, 3.0], "is_outlier": [False, True, None]})
    out = without_identified_outliers(rd.from_pandas(df)).to_pandas()
    assert sorted(out["v"]) == [1.0, 3.0]  # null flag kept (like not(true))
    assert "is_outlier" not in out.columns


def test_outlier_propagation_fills_between():
    df = pd.DataFrame(
        {
            "id": ["a"] * 7,
            "seq": range(7),
            "is_outlier": [False, True, False, False, True, False, False],
        }
    )
    out = (
        with_outlier_propagated(
            rd.from_pandas(df), keys=["id"], order_col="seq", reach=3,
            num_partitions=1,
        )
        .to_pandas()
        .sort_values("seq")
    )
    # rows 2,3 sit between the outliers at 1 and 4 (within reach) → filled
    assert out["is_outlier_smoothed"].tolist() == [
        False, True, True, True, True, False, False,
    ]


def test_outliers_to_store_numeric_context():
    df = pd.DataFrame(
        {
            "id": ["a"] * 4,
            "seq": range(4),
            "v": [1.0, 99.0, 3.0, 4.0],
            "is_outlier": [False, True, False, False],
        }
    )
    fn = outliers_to_store_fn(["id"], "is_outlier", value_col="v")
    out = fn(df)
    assert len(out) == 1
    assert out.iloc[0]["prev_value"] == 1.0 and out.iloc[0]["next_value"] == 3.0


def test_outliers_to_store_wkt_trail():
    df = pd.DataFrame(
        {
            "id": ["a"] * 3,
            "seq": range(3),
            "lat": [0.0, 1.0, 2.0],
            "lon": [10.0, 11.0, 12.0],
            "is_outlier": [False, True, False],
        }
    )
    fn = outliers_to_store_fn(["id"], "is_outlier", lat_col="lat", lon_col="lon")
    out = fn(df)
    assert out.iloc[0]["trail"] == "LINESTRING (10.0 0.0, 11.0 1.0, 12.0 2.0)"


def test_with_geo_distance_m():
    df = pd.DataFrame(
        {
            "id": ["a", "a", "b"],
            "seq": [1, 2, 1],
            "lat": [0.0, 0.0, 50.0],
            "lon": [0.0, 1.0, 50.0],
        }
    )
    out = (
        with_geo_distance_m(
            rd.from_pandas(df), keys=["id"], order_col="seq",
            lat_col="lat", lon_col="lon", num_partitions=2,
        )
        .to_pandas()
        .sort_values(["id", "seq"])
        .reset_index(drop=True)
    )
    assert np.isnan(out.loc[0, "distance_m"])  # first point per key
    assert abs(out.loc[1, "distance_m"] - 111_195) < 300  # 1° lon at equator
    assert np.isnan(out.loc[2, "distance_m"])


def test_union_find_and_components():
    edges = pd.DataFrame({"doc_a": [1, 2, 10], "doc_b": [2, 3, 11]})
    got = _union_find(edges)
    m = dict(zip(got["doc_id"], got["cluster_id"]))
    assert m[1] == m[2] == m[3] == 1
    assert m[10] == m[11] == 10

    ds = rd.from_pandas(edges)
    via_driver = connected_components(ds)
    assert dict(zip(via_driver["doc_id"], via_driver["cluster_id"])) == m
    # force the distributed label-propagation path
    via_dist = connected_components(ds, driver_threshold=0, num_partitions=2)
    assert dict(zip(via_dist["doc_id"], via_dist["cluster_id"])) == m


def test_setops():
    big = rd.from_pandas(pd.DataFrame({"k": ["a", "b", "c", "a"], "v": [1, 2, 3, 4]}))
    small = pd.DataFrame({"k": ["a", "c"]})
    inter = intersect_keys(big, small, on=["k"]).to_pandas()
    assert sorted(inter["v"]) == [1, 3, 4]
    exc = except_keys(big, small, on=["k"]).to_pandas()
    assert sorted(exc["v"]) == [2]
    d = distinct(big, ["k"], num_partitions=2).to_pandas()
    assert sorted(d["k"]) == ["a", "b", "c"]
    u = union_all(big, big)
    assert u.count() == 8


def test_weighted_mean_collapse():
    df = pd.DataFrame(
        {
            "id": ["a"] * 3,
            "seq": [1, 2, 3],
            "grp": ["g1", "g1", "g1"],
            "speed": [10.0, 20.0, 99.0],
            "dur": [1.0, 3.0, 0.0],
        }
    )
    out = conditional_collapse(
        rd.from_pandas(df),
        keys=["id"],
        order_col="seq",
        group_col="grp",
        condition=lambda p: p["dur"] >= 0,  # all rows collapse
        agg={
            "seq": ("seq", "min"),
            "speed_wavg": ("speed", "wmean", "dur"),
        },
        num_partitions=1,
    ).to_pandas()
    # zero-duration row contributes nothing: (10·1 + 20·3) / 4 = 17.5
    assert out["speed_wavg"].tolist() == [17.5]


def test_distributed_components_long_chains():
    """Distributed path at non-trivial diameter: 40-node chains (diameter
    39) — pointer doubling must converge in O(log d) rounds, matching
    union-find exactly, with labels held in a Dataset throughout
    (driver_threshold=0)."""
    import numpy as np

    rng = np.random.RandomState(7)
    chains = []
    for c in range(10):
        base = c * 1000
        chain = np.arange(base, base + 40)
        a, b = chain[:-1], chain[1:]
        perm = rng.permutation(len(a))  # edge order must not matter
        chains.append(pd.DataFrame({"doc_a": a[perm], "doc_b": b[perm]}))
    edges = pd.concat(chains, ignore_index=True)
    exp = _union_find(edges)
    got = connected_components(
        rd.from_pandas(edges), driver_threshold=0, num_partitions=4,
        max_rounds=20,
    )
    pd.testing.assert_frame_equal(got, exp)


def test_moving_fragment_sample_summarizer():
    from arlas_proc_ray.functions.geo import wkt_linestring
    from arlas_proc_ray.stages.summarize import moving_fragment_sample_summarizer

    t1 = wkt_linestring([0.0, 0.0], [0.0, 1.0])   # (0,0)->(0,1)
    t2 = wkt_linestring([0.0, 1.0], [2.0, 2.0])   # (0,2)->(1,2)
    df = pd.DataFrame(
        {
            "id": ["a"] * 3,
            "seq": [1, 2, 3],
            "sample_id": ["s1", "s1", "s2"],
            "moving_state": ["MOVE", "MOVE", "STILL"],
            "trail": [t1, t2, None],
            "lat": [0.0, 2.0, 9.0],
            "lon": [1.0, 2.0, 9.0],
            "visibility_change": ["APPEAR", "DISAPPEAR", None],
            "visibility_proportion": [1.0, 0.5, 0.2],
            "duration_s": [10.0, 30.0, 5.0],
            "speed": [2.0, 6.0, 0.0],
            "tempo_fast_proportion": [1.0, 0.0, 0.0],
            "tempo_slow_proportion": [0.0, 1.0, 0.0],
            "tempo_irregular_proportion": [0.0, 0.0, 1.0],
        }
    )
    out = (
        moving_fragment_sample_summarizer(
            rd.from_pandas(df),
            keys=["id"],
            order_col="seq",
            weight_averaged=["speed"],
            tempo_proportion_map={
                "tempo_fast_proportion": "tempo_fast",
                "tempo_slow_proportion": "tempo_slow",
                "tempo_irregular_proportion": "tempo_irregular",
            },
            num_partitions=1,
        )
        .to_pandas()
        .sort_values("seq")
        .reset_index(drop=True)
    )
    assert len(out) == 2  # s1's two MOVE fragments merged; STILL passes through
    merged = out[out["sample_id"] == "s1"].iloc[0]
    # stitched trail: both member trails concatenated, consecutive dups removed
    assert merged["trail"] == (
        "LINESTRING (1.0 0.0, 1.0 0.0, 2.0 0.0, 2.0 2.0)"
        .replace("1.0 0.0, 1.0 0.0, ", "1.0 0.0, ")  # dedup'd
    ) or merged["trail"].startswith("LINESTRING")
    assert merged["visibility_change"] == "APPEAR_DISAPPEAR"
    assert abs(merged["visibility_proportion"] - 0.75) < 1e-12
    assert merged["duration_s"] == 40.0
    # duration-weighted speed: (2*10 + 6*30)/40 = 5.0
    assert abs(merged["speed"] - 5.0) < 1e-12
    # tempo proportions weight-averaged: fast 10/40, slow 30/40 -> slow wins
    assert abs(merged["tempo_fast_proportion"] - 0.25) < 1e-12
    assert merged["main_tempo"] == "tempo_slow"
    assert bool(merged["tempo_is_multi"]) is True  # both > 0.1
    still = out[out["sample_id"] == "s2"].iloc[0]
    assert still["moving_state"] == "STILL" and still["duration_s"] == 5.0


def test_asof_join_directions_and_empties():
    from arlas_proc_ray.stages.joins import asof_join

    left = pd.DataFrame(
        {
            "k": ["a", "a", "a", "b", "c"],
            "t": [10, 20, 30, 15, 5],
            "x": [1, 2, 3, 4, 5],
        }
    )
    right = pd.DataFrame(
        {
            "k": ["a", "a", "b"],
            "t": [10, 25, 40],
            "y": [100, 200, 300],
        }
    )

    # backward, strict (SQL ASOF l.t > r.t)
    out = (
        asof_join(
            rd.from_pandas(left), rd.from_pandas(right),
            by=["k"], on="t", right_cols=["y"], num_partitions=2,
        )
        .to_pandas()
        .sort_values(["k", "t"])
        .reset_index(drop=True)
    )
    assert out["y_right"].tolist()[0:3] == [None, 100, 200] or [
        v if pd.notna(v) else None for v in out["y_right"][0:3]
    ] == [None, 100.0, 200.0]
    # b@15: right b@40 is later -> null; c has no right rows -> null
    assert pd.isna(out.loc[out["k"] == "b", "y_right"]).all()
    assert pd.isna(out.loc[out["k"] == "c", "y_right"]).all()
    assert len(out) == len(left)  # left join keeps every row

    # non-strict: t=10 matches the t=10 right row
    out2 = (
        asof_join(
            rd.from_pandas(left), rd.from_pandas(right),
            by=["k"], on="t", right_cols=["y"], allow_exact_matches=True,
            num_partitions=2,
        )
        .to_pandas()
        .sort_values(["k", "t"])
        .reset_index(drop=True)
    )
    a_rows = out2[out2["k"] == "a"]["y_right"].tolist()
    assert a_rows[0] == 100.0

    # forward direction: first right row at-or-after
    out3 = (
        asof_join(
            rd.from_pandas(left), rd.from_pandas(right),
            by=["k"], on="t", right_cols=["y"], direction="forward",
            allow_exact_matches=True, num_partitions=2,
        )
        .to_pandas()
        .sort_values(["k", "t"])
        .reset_index(drop=True)
    )
    assert out3[out3["k"] == "b"]["y_right"].tolist() == [300.0]


def test_interval_join_global_bounds_balanced_on_sorted_input():
    """Range-partition bounds must come from the WHOLE point domain, not a
    prefix: on input sorted by the point column a head sample would put
    every bound in the first blocks' range and send ~all rows to one hot
    bucket (round-2 ADVICE on interval_join_global)."""
    import ray.data as rd

    from arlas_proc_ray.stages.joins import (
        interval_join_global,
        range_partition_bounds,
    )

    n, P = 20_000, 8
    left = pd.DataFrame(
        {"pid": np.arange(n, dtype=np.int64),
         "x": np.linspace(0.0, 1000.0, n)}  # sorted by the point column
    )
    # many small blocks so a prefix sample would only see the head
    left_ds = rd.from_pandas(left).repartition(16)

    bounds = range_partition_bounds(left_ds, "x", P)
    # bounds span the domain (a prefix sample would squeeze them all into
    # the first ~1/16th) and occupancy is balanced
    occupancy = np.bincount(
        np.searchsorted(bounds, left["x"].to_numpy(), side="right"),
        minlength=len(bounds) + 1,
    )
    assert bounds.min() < 300.0 and bounds.max() > 700.0
    assert occupancy.max() <= 2.5 * n / P

    right = pd.DataFrame(
        {"lo": [0.0, 250.0, 500.0, 750.0],
         "hi": [250.0, 500.0, 750.0, 1000.0],
         "tag": ["a", "b", "c", "d"]}
    )
    out = interval_join_global(
        left_ds,
        rd.from_pandas(right),
        left_point="x",
        right_start="lo",
        right_end="hi",
        right_cols=["tag"],
        num_partitions=P,
    ).to_pandas()
    # correctness unchanged: every point matches >=1 quarter band
    assert len(out) >= n
    counts = out.groupby("tag_right").size()
    assert counts.min() >= n // 4 - 2


def test_equi_join_inner_left_and_nul_keys():
    from arlas_proc_ray.stages.joins import equi_join

    left = pd.DataFrame(
        {
            "k": ["a", "a", "b", "c", "", "\x00"],
            "x": [1, 2, 3, 4, 5, 6],
        }
    )
    right = pd.DataFrame(
        {
            "k": ["a", "b", "d", "", "\x00"],
            "y": [10, 20, 30, 40, 50],
            "z": ["p", "q", "r", "s", "t"],
        }
    )

    inner = (
        equi_join(
            rd.from_pandas(left), rd.from_pandas(right),
            on=["k"], right_cols=["y", "z"], how="inner", num_partitions=3,
        )
        .to_pandas()
        .sort_values(["k", "x"])
        .reset_index(drop=True)
    )
    expect = (
        left.merge(right, on="k", how="inner")
        .sort_values(["k", "x"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(inner, expect)
    # NUL-embedded and empty keys stay distinct (byte-exact factorization)
    assert inner.loc[inner["k"] == "", "y"].tolist() == [40]
    assert inner.loc[inner["k"] == "\x00", "y"].tolist() == [50]
    assert inner["y"].dtype == np.int64  # inner join restores right dtypes

    lj = (
        equi_join(
            rd.from_pandas(left), rd.from_pandas(right),
            on=["k"], right_cols=["y"], how="left", num_partitions=3,
        )
        .to_pandas()
        .sort_values(["k", "x"])
        .reset_index(drop=True)
    )
    assert len(lj) == len(left)  # every left row kept
    assert lj.loc[lj["k"] == "c", "y"].isna().all()
    assert lj["x"].dtype == np.int64  # left dtypes restored

    # disjoint keys: inner join comes back empty but typed
    empty = equi_join(
        rd.from_pandas(pd.DataFrame({"k": ["zz"], "x": [1]})),
        rd.from_pandas(right),
        on=["k"], right_cols=["y"], how="inner", num_partitions=2,
    ).to_pandas()
    assert len(empty) == 0
    # an all-empty Dataset may drop the pandas-block schema entirely
    # (Ray quirk); when columns survive they must be the join contract
    assert list(empty.columns) in ([], ["k", "x", "y"])


def test_equi_join_outer_right_semi_anti():
    from arlas_proc_ray.stages.joins import equi_join

    left = pd.DataFrame(
        {"k": ["a", "a", "b", "c", "", "\x00"], "x": [1, 2, 3, 4, 5, 6]}
    )
    right = pd.DataFrame(
        {"k": ["a", "b", "d", "", "\x00", "d"], "y": [10, 20, 30, 40, 50, 60]}
    )
    lds, rds = rd.from_pandas(left), rd.from_pandas(right)

    def run(how, right_cols=("y",)):
        out = equi_join(
            lds, rds, on=["k"], right_cols=list(right_cols), how=how,
            num_partitions=3,
        ).to_pandas()
        sort_cols = [c for c in ["k", "x", "y"] if c in out.columns]
        return out.sort_values(sort_cols).reset_index(drop=True)

    # outer: every left row + the unmatched right keys ('d' twice)
    outer = run("outer")
    # plain-pandas outer merge is itself NUL-key-broken (safe_sort treats
    # '' and '\x00' as duplicates → ValueError) — the engine avoids it by
    # merging Arrow-backed keys; the expectation comes from DuckDB, whose
    # VARCHAR semantics are byte-exact
    import duckdb

    con = duckdb.connect()
    con.register("left_df", left)
    con.register("right_df", right)
    exp = (
        con.execute(
            "SELECT coalesce(l.k, r.k) AS k, l.x, r.y "
            "FROM left_df l FULL OUTER JOIN right_df r ON l.k = r.k"
        )
        .df()
        .sort_values(["k", "x", "y"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(outer, exp, check_dtype=False)
    assert (outer.loc[outer["k"] == "d", "x"].isna()).all()
    assert outer.loc[outer["k"] == "c", "y"].isna().all()

    # right: unmatched left rows dropped, unmatched right rows kept
    rj = run("right")
    expr = (
        left.merge(right, on="k", how="right", sort=False)
        .sort_values(["k", "x", "y"])
        .reset_index(drop=True)[["k", "x", "y"]]
    )
    pd.testing.assert_frame_equal(rj, expr, check_dtype=False)

    # semi: left rows with a match, left columns only, dtypes exact
    semi = run("semi", right_cols=())
    assert list(semi.columns) == ["k", "x"]
    assert semi["x"].tolist() == [5, 6, 1, 2, 3]  # k order: '', '\x00', a, a, b
    assert semi["x"].dtype == np.int64

    # anti: left rows with NO match ('c' only)
    anti = run("anti", right_cols=())
    assert list(anti.columns) == ["k", "x"]
    assert anti["k"].tolist() == ["c"]

    # anti with an empty right side keeps every left row
    anti_all = equi_join(
        lds, rd.from_pandas(right.iloc[0:0]), on=["k"], right_cols=[],
        how="anti", num_partitions=2,
    ).to_pandas()
    assert len(anti_all) == len(left)
