"""stages/windows.py — throttle/debounce filter."""

import pandas as pd

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
