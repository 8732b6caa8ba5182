"""Funnel + cohort retention (stages/analytics.py): strict ordering,
chain-break nulls, Monday-week truncation, cross-partition exactness."""

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
