"""Funnel + cohort retention (stages/analytics.py): strict ordering,
chain-break nulls, Monday-week truncation, cross-partition exactness."""

import numpy as np
import pandas as pd
import ray.data as rd

from arlas_proc_ray.stages.analytics import cohort_retention, funnel, week_start


def _ev(rows):
    return pd.DataFrame(rows, columns=["user_id", "event_type", "ts"]).assign(
        ts=lambda d: pd.to_datetime(d["ts"])
    )


def test_funnel_strict_order_and_chain_break():
    df = _ev(
        [
            # u1 completes in order
            (1, "view", "2024-01-01"),
            (1, "click", "2024-01-02"),
            (1, "purchase", "2024-01-03"),
            # u2 clicked BEFORE viewing: click must not count; later click does
            (2, "click", "2024-01-01"),
            (2, "view", "2024-01-02"),
            (2, "click", "2024-01-04"),
            # u3 views only -> click/purchase null
            (3, "view", "2024-01-01"),
            # u4 never views -> absent from output
            (4, "purchase", "2024-01-01"),
        ]
    )
    out = (
        funnel(
            rd.from_pandas(df).repartition(3),
            user_col="user_id",
            type_col="event_type",
            ts_col="ts",
            steps=["view", "click", "purchase"],
            num_partitions=4,
        )
        .to_pandas()
        .sort_values("user_id")
        .set_index("user_id")
    )
    assert sorted(out.index) == [1, 2, 3]
    assert out.loc[1, "purchase_ts"] == pd.Timestamp("2024-01-03")
    assert out.loc[2, "click_ts"] == pd.Timestamp("2024-01-04")
    assert pd.isna(out.loc[2, "purchase_ts"])
    assert pd.isna(out.loc[3, "click_ts"]) and pd.isna(out.loc[3, "purchase_ts"])


def test_week_start_is_monday():
    s = pd.to_datetime(
        pd.Series(["2024-01-01 05:00", "2024-01-07 23:59", "2024-01-08 00:00"])
    )
    got = week_start(s).dt.strftime("%Y-%m-%d %a").tolist()
    assert got == ["2024-01-01 Mon", "2024-01-01 Mon", "2024-01-08 Mon"]


def test_cohort_retention_counts_distinct_users_once():
    rows = []
    # cohort week of 2024-01-01: users 1,2 - user 1 active weeks 0 and 2,
    # user 2 only week 0 (twice - must count once)
    rows += [(1, "e", "2024-01-02"), (1, "e", "2024-01-17")]
    rows += [(2, "e", "2024-01-03"), (2, "e", "2024-01-05")]
    # cohort week of 2024-01-08: user 3 active weeks 0 and 1
    rows += [(3, "e", "2024-01-09"), (3, "e", "2024-01-16")]
    out = (
        cohort_retention(
            rd.from_pandas(_ev(rows)).repartition(3),
            user_col="user_id",
            ts_col="ts",
            num_partitions=4,
        )
        .to_pandas()
        .sort_values(["cohort_week", "week_offset"])
        .reset_index(drop=True)
    )
    w1, w2 = pd.Timestamp("2024-01-01"), pd.Timestamp("2024-01-08")
    expect = pd.DataFrame(
        {
            "cohort_week": [w1, w1, w2, w2],
            "week_offset": [0, 2, 0, 1],
            "active_users": [2, 1, 1, 1],
        }
    )
    pd.testing.assert_frame_equal(
        out[["cohort_week", "week_offset", "active_users"]].astype(
            {"week_offset": "int64", "active_users": "int64"}
        ),
        expect,
    )


# ---------------------------------------------------------------------------
# pivot / unpivot / rollup
# ---------------------------------------------------------------------------


def test_pivot_agg_counts_and_sums_across_blocks():
    from arlas_proc_ray.stages.analytics import pivot_agg

    df = pd.DataFrame(
        {
            "k": ["a", "a", "a", "b", "b", "c"],
            "cat": ["x", "x", "y", "y", "z", "x"],  # 'z' excluded below
            "v": [1, 2, 3, 4, 5, 6],
        }
    )
    ds = rd.from_pandas(df).repartition(3)
    got = (
        pivot_agg(ds, key_col="k", category_col="cat", value_col="v",
                  categories=["x", "y"], agg="sum", num_partitions=2)
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    assert got["cat_x"].tolist() == [3, 0, 6]
    assert got["cat_y"].tolist() == [3, 4, 0]
    assert got["cat_x"].dtype == np.int64
    # count mode: key 'b' has one excluded-category row -> still present
    cnt = (
        pivot_agg(ds, key_col="k", category_col="cat", value_col="v",
                  categories=["x", "y"], agg="count", num_partitions=2)
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    assert cnt["cat_x"].tolist() == [2, 0, 1]
    assert cnt["cat_y"].tolist() == [1, 1, 0]
    assert cnt["k"].tolist() == ["a", "b", "c"]


def test_unpivot_roundtrip_rowcount_and_values():
    from arlas_proc_ray.stages.analytics import unpivot

    df = pd.DataFrame({"id": [1, 2], "p": [10, 20], "q": [0.5, 1.5]})
    out = (
        unpivot(rd.from_pandas(df), id_cols=["id"], value_cols=["p", "q"],
                var_name="m", value_name="val")
        .to_pandas().sort_values(["id", "m"]).reset_index(drop=True)
    )
    assert len(out) == 4
    assert out.loc[(out.id == 2) & (out.m == "p"), "val"].iloc[0] == 20.0
    assert out.loc[(out.id == 1) & (out.m == "q"), "val"].iloc[0] == 0.5


def test_rollup_counts_levels_sum_exactly():
    from arlas_proc_ray.stages.analytics import rollup_counts

    df = pd.DataFrame(
        {
            "a": ["r", "r", "s", "s"],
            "b": ["1", "2", "1", "1"],
            "cents": [100, 200, 300, 400],
        }
    )
    out = rollup_counts(
        rd.from_pandas(df).repartition(2), group_cols=["a", "b"],
        cents_col="cents", num_partitions=2,
    )
    total = out[out["a"].isna()]
    assert total["sum_cents"].tolist() == [1000]
    lvl_a = out[out["a"].notna() & out["b"].isna()].sort_values("a")
    assert lvl_a["sum_cents"].tolist() == [300, 700]
    finest = out[out["b"].notna()]
    assert finest["sum_cents"].sum() == 1000
    assert finest["n_rows"].sum() == 4


def test_category_affinity_jaccard_small_oracle():
    from arlas_proc_ray.stages.analytics import category_affinity

    # u1:{A,B}, u2:{A,B,C}, u3:{A}, u4:{B,C} (with duplicate rows mixed in)
    df = pd.DataFrame(
        {
            "uid": [1, 1, 1, 2, 2, 2, 3, 4, 4, 4],
            "cat": ["A", "B", "A", "A", "B", "C", "A", "B", "C", "C"],
        }
    )
    out = category_affinity(
        rd.from_pandas(df).repartition(3), id_col="uid", cat_col="cat",
        num_partitions=2,
    ).set_index(["type_a", "type_b"])
    # |A|=3 |B|=3 |C|=2; A∩B=2, A∩C=1, B∩C=2
    assert int(out.loc[("A", "B"), "co_users"]) == 2
    assert int(out.loc[("A", "B"), "union_users"]) == 4
    assert out.loc[("A", "B"), "jaccard"] == 0.5
    assert int(out.loc[("A", "C"), "co_users"]) == 1
    assert out.loc[("A", "C"), "jaccard"] == 0.25
    assert int(out.loc[("B", "C"), "union_users"]) == 3
    assert len(out) == 3  # only a<b pairs, no self/reversed rows


def test_last_touch_attribution_carry_and_exact_cents():
    from arlas_proc_ray.stages.analytics import last_touch_attribution

    # user 1: view, purchase(100), click, purchase(250) → view:1, click:1
    # user 2: purchase(999) with no prior touch → dropped
    # user 3: click, purchase(50), purchase(70) → click credited twice
    df = pd.DataFrame(
        {
            "uid": [1, 1, 1, 1, 2, 3, 3, 3],
            "seq": [1, 2, 3, 4, 1, 1, 2, 3],
            "etype": [
                "view", "purchase", "click", "purchase",
                "purchase", "click", "purchase", "purchase",
            ],
            "cents": [0, 100, 0, 250, 999, 0, 50, 70],
        }
    )
    out = last_touch_attribution(
        rd.from_pandas(df).repartition(3),
        key_col="uid", order_col="seq", type_col="etype",
        conv_type="purchase", cents_col="cents", num_partitions=2,
    ).set_index("touch_type")
    assert int(out.loc["view", "conversions"]) == 1
    assert out.loc["view", "attributed_value"] == 1.0
    assert int(out.loc["click", "conversions"]) == 3
    assert out.loc["click", "attributed_value"] == (250 + 50 + 70) / 100.0
    assert len(out) == 2  # user 2's untouched purchase is unattributed


def test_sequence_pattern_counts_nonoverlapping_and_raises():
    import pytest as _pytest

    from arlas_proc_ray.stages.analytics import sequence_pattern_counts

    # u1: v c c p v p  → 2 matches of vc*p; u2: p v c → 0 (dropped);
    # u3: v p v c p    → 2
    df = pd.DataFrame(
        {
            "uid": [1] * 6 + [2] * 3 + [3] * 5,
            "seq": list(range(6)) + list(range(3)) + list(range(5)),
            "etype": [
                "view", "click", "click", "purchase", "view", "purchase",
                "purchase", "view", "click",
                "view", "purchase", "view", "click", "purchase",
            ],
        }
    )
    sym = {"view": "v", "click": "c", "purchase": "p"}
    out = sequence_pattern_counts(
        rd.from_pandas(df).repartition(3), key_col="uid", order_col="seq",
        type_col="etype", symbol_of=sym, pattern="vc*p", num_partitions=2,
    ).to_pandas().set_index("uid")
    assert int(out.loc[1, "n_matches"]) == 2
    assert int(out.loc[3, "n_matches"]) == 2
    assert 2 not in out.index

    bad = pd.DataFrame({"uid": [1], "seq": [1], "etype": ["unknown"]})
    with _pytest.raises(Exception, match="no symbol"):
        sequence_pattern_counts(
            rd.from_pandas(bad), key_col="uid", order_col="seq",
            type_col="etype", symbol_of=sym, pattern="vc*p",
            num_partitions=1,
        ).to_pandas()


def test_lead_lag_correlation_detects_shift_and_matches_numpy():
    from arlas_proc_ray.stages.analytics import lead_lag_correlation

    rng = np.random.default_rng(4)
    days = np.arange(100, 160)
    x = pd.Series(rng.integers(0, 40, len(days)), index=days)
    y = pd.Series(0, index=days)
    # y echoes x two days later (plus noise) → peak r at lag +2
    y.iloc[2:] = (x.iloc[:-2].to_numpy() * 3
                  + rng.integers(0, 5, len(days) - 2))
    out = lead_lag_correlation(x, y, lags=range(-3, 4)).set_index("lag")
    assert out["r"].idxmax() == 2
    # lag-0 value equals numpy's Pearson on the aligned grid
    want = np.corrcoef(x.to_numpy(float), y.to_numpy(float))[0, 1]
    assert abs(out.loc[0, "r"] - want) < 1e-12
