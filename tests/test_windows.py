"""stages/windows.py — throttle/debounce filter."""

import pandas as pd
import ray.data as rd

# ---------------------------------------------------------------------------
# throttle_events (debounce)
# ---------------------------------------------------------------------------


def test_throttle_events_lag_semantics():
    import numpy as np
    import ray.data as rd

    from arlas_proc_ray.stages.windows import throttle_events

    ts = pd.to_datetime(
        [
            "2024-01-01 00:00:00",  # k=a keep (first)
            "2024-01-01 00:00:30",  # k=a drop (30s gap)
            "2024-01-01 00:00:50",  # k=a drop (20s from PREVIOUS, lag not anchor)
            "2024-01-01 00:02:10",  # k=a keep (80s gap)
            "2024-01-01 00:00:00",  # k=b keep (first; own key)
        ]
    )
    pdf = pd.DataFrame(
        {
            "id": np.arange(5, dtype=np.int64),
            "k": ["a", "a", "a", "a", "b"],
            "ts": ts,
        }
    )
    out = throttle_events(
        rd.from_pandas(pdf).repartition(2),
        keys=["k"],
        ts_col="ts",
        min_gap_us=60_000_000,
        order_cols=["id"],
        num_partitions=4,
    ).to_pandas()
    assert sorted(out["id"]) == [0, 3, 4]


def test_throttle_events_tie_break_deterministic():
    import numpy as np
    import ray.data as rd

    from arlas_proc_ray.stages.windows import throttle_events

    # two rows with IDENTICAL ts: the lower id is the predecessor, the
    # higher id is dropped (gap 0), regardless of input order
    ts = pd.to_datetime(["2024-01-01"] * 2)
    pdf = pd.DataFrame({"id": np.array([7, 3], np.int64), "k": ["x", "x"], "ts": ts})
    out = throttle_events(
        rd.from_pandas(pdf),
        keys=["k"],
        ts_col="ts",
        min_gap_us=1,
        order_cols=["id"],
    ).to_pandas()
    assert list(out["id"]) == [3]


# cusum_alarm_points


def _cusum_loop(vals, ref, h):
    """Independent oracle: the literal Page recurrence with a Python loop."""
    s, alarms, armed = 0, [], False
    for i, v in enumerate(vals):
        s = max(0, s + (v - ref))
        if s > h and not armed:
            alarms.append((i, s))
        armed = s > h
    return alarms


def test_cusum_closed_form_matches_recurrence_loop():
    import numpy as np

    from arlas_proc_ray.stages.windows import cusum_alarm_points

    rng = np.random.default_rng(11)
    rows = []
    for uid in range(7):
        vals = rng.integers(0, 120, size=80)
        rows.extend((uid, i, int(v)) for i, v in enumerate(vals))
    df = pd.DataFrame(rows, columns=["uid", "seq", "v"])
    out = (
        cusum_alarm_points(
            rd.from_pandas(df).repartition(4),
            key_col="uid", order_col="seq", value_int_col="v",
            ref=55, threshold=300, num_partitions=3,
        )
        .to_pandas()
        .sort_values(["uid", "seq"])
    )
    got = {
        (int(r.uid), int(r.seq), int(r.cusum)) for r in out.itertuples()
    }
    want = set()
    for uid, sub in df.groupby("uid"):
        for i, s in _cusum_loop(sub["v"].tolist(), 55, 300):
            want.add((uid, int(sub["seq"].iloc[i]), s))
    assert got == want and len(want) > 0


def test_cusum_rearm_after_falling_below():
    from arlas_proc_ray.stages.windows import cusum_alarm_points

    # spike → reset to 0 via huge negative → spike again: two alarms
    df = pd.DataFrame(
        {
            "uid": [1] * 5,
            "seq": range(5),
            "v": [100, 0, -1000, 100, 0],
        }
    )
    out = cusum_alarm_points(
        rd.from_pandas(df), key_col="uid", order_col="seq",
        value_int_col="v", ref=0, threshold=50, num_partitions=2,
    ).to_pandas()
    assert sorted(out["seq"].tolist()) == [0, 3]


# time_weighted_avg


def test_time_weighted_avg_holding_times():
    from arlas_proc_ray.stages.windows import time_weighted_avg

    day = pd.Timestamp("2024-03-01")
    df = pd.DataFrame(
        {
            "uid": [1, 1, 1, 1, 2],
            "seq": [1, 2, 3, 4, 1],
            "ts": [
                day,
                day + pd.Timedelta(seconds=10),
                day + pd.Timedelta(seconds=40),
                day + pd.Timedelta(days=1),  # next bucket, single → dropped
                day,  # single-event bucket → dropped
            ],
            "v": [100, 400, 999, 5, 7],
        }
    )
    out = time_weighted_avg(
        rd.from_pandas(df).repartition(2),
        key_col="uid", ts_col="ts", order_col="seq", value_int_col="v",
        num_partitions=2,
    ).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    # weights: v=100 for 10s, v=400 for 30s; last event carries none
    assert int(r["dur_us"]) == 40_000_000
    assert r["twap"] == (100 * 10 + 400 * 30) / 40
    assert r["window_start"] == day


def test_time_weighted_avg_orders_by_time_not_seq():
    from arlas_proc_ray.stages.windows import time_weighted_avg

    day = pd.Timestamp("2024-03-01")
    # seq order disagrees with time order; holding time follows TIME
    df = pd.DataFrame(
        {
            "uid": [1, 1],
            "seq": [2, 1],
            "ts": [day, day + pd.Timedelta(seconds=5)],
            "v": [10, 20],
        }
    )
    out = time_weighted_avg(
        rd.from_pandas(df), key_col="uid", ts_col="ts", order_col="seq",
        value_int_col="v", num_partitions=1,
    ).to_pandas()
    assert int(out["dur_us"].iloc[0]) == 5_000_000
    assert out["twap"].iloc[0] == 10.0


# trailing_range_agg


def test_trailing_range_agg_matches_bruteforce_incl_ts_peers():
    import numpy as np

    from arlas_proc_ray.stages.windows import trailing_range_agg

    rng = np.random.default_rng(6)
    rows = []
    seq = 0
    for uid in range(6):
        t = 0
        for _ in range(40):
            t += int(rng.integers(0, 5)) * 1000  # gaps incl. ZERO (peers)
            rows.append((uid, seq, t, int(rng.integers(1, 100))))
            seq += 1
    df = pd.DataFrame(rows, columns=["uid", "seq", "tus", "v"])
    df["ts"] = pd.to_datetime(df["tus"], unit="us")
    W = 3000
    out = (
        trailing_range_agg(
            rd.from_pandas(df).repartition(4),
            key_col="uid", ts_col="ts", order_col="seq",
            value_int_col="v", window_us=W,
            sum_name="tsum", num_partitions=3,
        )
        .to_pandas()
        .set_index("seq")
    )
    for r in df.itertuples():
        m = df[(df.uid == r.uid) & (df.tus >= r.tus - W) & (df.tus <= r.tus)]
        assert int(out.loc[r.seq, "trailing_n"]) == len(m), r.seq
        assert int(out.loc[r.seq, "tsum"]) == int(m["v"].sum()), r.seq


def test_trailing_range_agg_keys_never_bleed():
    from arlas_proc_ray.stages.windows import trailing_range_agg

    base = pd.Timestamp("2024-01-01")
    # two keys interleaved at the SAME timestamps: windows must not mix
    df = pd.DataFrame(
        {
            "uid": [1, 2, 1, 2],
            "seq": [0, 1, 2, 3],
            "ts": [base, base, base, base],
            "v": [1, 10, 2, 20],
        }
    )
    out = trailing_range_agg(
        rd.from_pandas(df), key_col="uid", ts_col="ts", order_col="seq",
        value_int_col="v", window_us=10**9, num_partitions=2,
    ).to_pandas()
    got = dict(zip(out["seq"], out["trailing_sum"]))
    assert got[0] == 3 and got[2] == 3  # uid 1: both peer rows, never 10/20
    assert got[1] == 30 and got[3] == 30
