"""Unit tests for the operator library (golden comparisons on tiny data).

Mirrors the reference's per-transformer suites under
/root/reference/src/test/scala/io/arlas/data/transform/** — tiny
hand-checkable inputs, exact expected outputs.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from arlas_proc_ray.stages import rowwise
from arlas_proc_ray.stages.keyed import (
    dedup_keep_first,
    keyed_partition_map,
    with_duration,
    with_fragments,
    with_rolling_median_outlier,
    with_session_id,
    with_state_id_on_change,
    with_visibility_change,
)
from arlas_proc_ray.stages.lookup import broadcast_join, broadcast_semi_join
from arlas_proc_ray.stages.summarize import conditional_collapse


def _events_df():
    return pd.DataFrame(
        {
            "id": ["a", "a", "a", "a", "b", "b"],
            "seq": [1, 2, 3, 4, 1, 2],
            "ts": [0.0, 10.0, 2000.0, 2010.0, 5.0, 6.0],
            "v": [1.0, 2.0, 100.0, 3.0, 7.0, 9.0],
            "state": ["x", "x", "y", "y", "x", "y"],
        }
    )


def _ds():
    return rd.from_pandas(_events_df())


def _sorted(ds, by):
    return ds.to_pandas().sort_values(by).reset_index(drop=True)


def test_with_duration():
    out = _sorted(
        with_duration(_ds(), keys=["id"], order_col="seq", ts_col="ts", num_partitions=2),
        ["id", "seq"],
    )
    assert out.loc[out.id.eq("a"), "duration_s"].tolist()[1:] == [10.0, 1990.0, 10.0]
    assert np.isnan(out.loc[0, "duration_s"])


def test_state_id_on_change():
    out = _sorted(
        with_state_id_on_change(
            _ds(), keys=["id"], order_col="seq", state_col="state",
            target="sid", num_partitions=2,
        ),
        ["id", "seq"],
    )
    assert out["sid"].tolist() == ["a#1", "a#1", "a#3", "a#3", "b#1", "b#2"]


def test_fragments_drop_first_row_per_key():
    out = _sorted(
        with_fragments(
            _ds(), keys=["id"], order_col="seq", ts_col="ts", value_col="v",
            num_partitions=2,
        ),
        ["id", "seq"],
    )
    assert len(out) == 4  # 6 rows - 2 first-rows
    f = out.iloc[0]
    assert f["fragment_id"] == "a#1_2"
    assert f["duration_s"] == 10.0 and f["value_avg"] == 1.5


def test_sessionize():
    out = _sorted(
        with_session_id(
            _ds(), keys=["id"], order_col="seq", ts_col="ts", gap_s=100.0,
            num_partitions=2,
        ),
        ["id", "seq"],
    )
    assert out["session_id"].tolist() == ["a#1", "a#1", "a#3", "a#3", "b#1", "b#1"]


def test_visibility_change():
    df = pd.DataFrame(
        {"id": ["a"] * 4, "seq": [1, 2, 3, 4], "vis": [0, 1, 1, 0]}
    )
    out = _sorted(
        with_visibility_change(
            rd.from_pandas(df), keys=["id"], order_col="seq",
            visibility_col="vis", num_partitions=2,
        ),
        ["id", "seq"],
    )
    assert out["visibility_change"].tolist() == [None, "APPEAR", "DISAPPEAR", None]


def test_rolling_median_outlier():
    out = _sorted(
        with_rolling_median_outlier(
            _ds(), keys=["id"], order_col="seq", value_col="v",
            half_window=1, threshold=10.0, num_partitions=2,
        ),
        ["id", "seq"],
    )
    a = out[out.id.eq("a")]
    # v = 1,2,100,3 → rolling medians (window 3, center, edge-truncated):
    # [1.5, 2, 3, 51.5]; last row: |3 − 51.5| > 10 ⇒ also an outlier
    assert a["rolling_median"].tolist() == [1.5, 2.0, 3.0, 51.5]
    assert a["is_outlier"].tolist() == [False, False, True, True]


def test_dedup_keep_first():
    df = pd.DataFrame(
        {"id": ["a", "a", "b"], "seq": [2, 1, 5], "v": [10.0, 20.0, 30.0]}
    )
    out = _sorted(
        dedup_keep_first(rd.from_pandas(df), keys=["id"], order_col="seq",
                         num_partitions=2),
        ["id"],
    )
    assert out["seq"].tolist() == [1, 5]  # keeps smallest seq per id


def test_conditional_collapse():
    out = conditional_collapse(
        _ds(),
        keys=["id"],
        order_col="seq",
        group_col="state",
        condition=lambda pdf: pdf["state"].eq("x"),
        agg={
            "v_sum": ("v", "sum"),
            "seq": ("seq", "min"),
            "n": ("v", "count"),
        },
        num_partitions=2,
    ).to_pandas()
    # 'x' rows collapse per state value within partition groups; 'y' pass through
    ys = out[out.get("state").eq("y").fillna(False)] if "state" in out else None
    assert (out["n"].dropna() >= 1).all()
    assert len(out) < 6


def test_broadcast_join_and_semi():
    small = pd.DataFrame({"id": ["a", "b"], "label": ["A", "B"]})
    out = _sorted(broadcast_join(_ds(), small, on=["id"]), ["id", "seq"])
    assert out["label"].tolist() == ["A"] * 4 + ["B"] * 2

    keys = pd.DataFrame({"id": ["a"]})
    semi = broadcast_semi_join(_ds(), keys, on=["id"]).to_pandas()
    assert set(semi["id"]) == {"a"}
    anti = broadcast_semi_join(_ds(), keys, on=["id"], anti=True).to_pandas()
    assert set(anti["id"]) == {"b"}


def test_rowwise_ops():
    t = pa.table(
        {
            "MyCol Name": [1, 2],
            "num": ["1,5", "bad"],
            "ts_str": ["2024-01-01T00:00:00", "nope"],
            "v": [5.0, 50.0],
        }
    )
    t2 = rowwise.lower_snake_case_columns(t)
    assert t2.column_names[0] == "my_col_name"

    t3 = rowwise.repair_doubles(t2, ["num"])
    assert t3.column("num").to_pylist() == [1.5, None]

    t4 = rowwise.parse_timestamp(t3, "ts_str")
    assert t4.column("ts_epoch").to_pylist() == [1704067200, None]

    t5 = rowwise.with_threshold_label(t4, "v", 10.0, "HIGH", "LOW", "lab")
    assert t5.column("lab").to_pylist() == ["LOW", "HIGH"]

    t6 = rowwise.filter_value_range(t5, "v", 0.0, 10.0)
    assert t6.num_rows == 1

    t7 = rowwise.with_empty_col(t5, "empty", pa.float64())
    assert t7.column("empty").null_count == 2

    t8 = rowwise.with_nested_struct(t5, "pos", {"a": "v", "b": "my_col_name"})
    assert t8.column("pos").type.num_fields == 2

    t9 = rowwise.pick_by_duration(t5, "v", 10.0, "v", "my_col_name", "picked")
    assert t9.column("picked").to_pylist()[0] == 5.0

    te = pa.table({"ts": pa.array([0, 86400], type=pa.int64())})
    tp = rowwise.with_time_partition(te, "ts")
    assert tp.column("time_partition").to_pylist() == [19700101, 19700102]


def test_with_tempo_proportions_and_election():
    import pyarrow as pa

    from arlas_proc_ray.stages.rowwise import with_tempo_proportions
    from arlas_proc_ray.stages.summarize import elect_main_tempo

    pmap = {
        "p_fast": "tempo_fast",
        "p_slow": "tempo_slow",
        "p_irr": "tempo_irregular",
    }
    t = pa.table({"tempo": ["tempo_fast", "tempo_slow", "tempo_irregular"]})
    out = with_tempo_proportions(t, "tempo", pmap).to_pandas()
    assert out["p_fast"].tolist() == [1.0, 0.0, 0.0]
    assert out["p_slow"].tolist() == [0.0, 1.0, 0.0]
    assert out["p_irr"].tolist() == [0.0, 0.0, 1.0]
    assert out["tempo_is_multi"].tolist() == [False] * 3

    # election over weight-averaged proportions
    import numpy as np
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "p_fast": [0.7, 0.2, 0.0, np.nan, 0.5],
            "p_slow": [0.1, 0.6, 0.0, np.nan, 0.5],
            "p_irr": [0.2, 0.2, 1.0, np.nan, 0.0],
        }
    )
    got = elect_main_tempo(pdf, pmap, irregular_tempo="tempo_irregular")
    assert got["main_tempo"].tolist() == [
        "tempo_fast",   # fast greatest
        "tempo_slow",   # slow greatest
        "tempo_irregular",  # only irregular represented
        "tempo_irregular",  # NaN (zero weight) row
        "tempo_fast",   # tie → first in map order
    ]
    assert got["tempo_is_multi"].tolist() == [True, True, False, False, True]


def test_as_es_data_projection():
    import pyarrow as pa

    from arlas_proc_ray.stages.rowwise import as_es_data

    t = pa.table(
        {"id": ["a"], "lat": [1.5], "lon": [-3.25], "ts": [1700000000]}
    )
    out = as_es_data(
        t, lat_col="lat", lon_col="lon", id_col="id", ts_col="ts"
    ).to_pandas()
    assert out["arlas_geo_point"][0] == "1.5,-3.25"
    assert out["arlas_id"][0] == "a#1700000000"


def test_sliding_window_membership():
    """Each row lands in exactly ceil(width/slide) windows and every
    window covering its timestamp (unit semantics of the hop explode)."""
    import pandas as pd

    from arlas_proc_ray.stages.windows import sliding_window_agg

    ts = pd.to_datetime(
        ["1970-01-01 00:00:05", "1970-01-01 00:00:14", "1970-01-01 00:00:29"]
    )
    df = pd.DataFrame({"k": ["a", "a", "a"], "id": [1, 2, 3], "ts": ts})
    out = (
        sliding_window_agg(
            rd.from_pandas(df), keys=["k"], ts_col="ts",
            width_s=20, slide_s=10,
            agg={"n": ("id", "count")},
            num_partitions=1,
        )
        .to_pandas()
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    # windows: [-10,10): {5}; [0,20): {5,14}; [10,30): {14,29}; [20,40): {29}
    starts = (
        out["window_start"].astype("datetime64[us]").astype("int64")
        // 1_000_000
    ).tolist()
    assert starts == [-10, 0, 10, 20]
    assert out["n"].tolist() == [1, 2, 2, 1]


def test_nul_byte_keys_group_byte_exactly():
    """Keys differing only by NUL bytes must stay distinct through the keyed
    layer (the round-2 Hypothesis finding: pandas' C-string hashtable merges
    '' with '\\x00' while partition_ids keeps them apart)."""
    df = pd.DataFrame(
        {
            "id": ["", "\x00", "\x00", "a\x00b", "ab", "ab"],
            "seq": [1, 1, 2, 1, 1, 2],
            "ts": [0.0, 0.0, 10.0, 0.0, 0.0, 5.0],
            "v": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0],
            "state": ["x", "x", "x", "x", "x", "y"],
        }
    )
    out = _sorted(
        with_duration(
            rd.from_pandas(df), keys=["id"], order_col="seq", ts_col="ts",
            num_partitions=4,
        ),
        ["id", "seq"],
    )
    # 4 byte-distinct keys: '', '\x00', 'a\x00b', 'ab' — each key's first
    # row has null duration; lag-diffs never cross NUL-distinct keys
    assert len(out) == 6
    by_key = {
        k: g.sort_values("seq")["duration_s"].tolist()
        for k, g in out.groupby(out["id"].str.encode("utf-8"))
    }
    assert len(by_key) == 4
    assert len(by_key[b""]) == 1 and np.isnan(by_key[b""][0])
    assert len(by_key[b"a\x00b"]) == 1 and np.isnan(by_key[b"a\x00b"][0])
    assert np.isnan(by_key[b"\x00"][0]) and by_key[b"\x00"][1] == 10.0
    assert np.isnan(by_key[b"ab"][0]) and by_key[b"ab"][1] == 5.0

    sid = _sorted(
        with_state_id_on_change(
            rd.from_pandas(df), keys=["id"], order_col="seq",
            state_col="state", target="sid", num_partitions=4,
        ),
        ["id", "seq"],
    )
    # derived ids embed the raw key bytes — '\x00' rows share one segment,
    # '' does not join them (groupby on bytes factorizes exactly; note
    # pandas .loc on a bytes index is NUL-merging, so assert via groupby)
    sid_sets = {
        k: set(g["sid"])
        for k, g in sid.groupby(sid["id"].str.encode("utf-8"))
    }
    assert sid_sets[b"\x00"] == {"\x00#1"}
    assert sid_sets[b""] == {"#1"}
    assert sid_sets[b"ab"] == {"ab#1", "ab#2"}


def test_resample_ffill_semantics():
    """Grid bounds are [ceil(min/step), floor(max/step)]; a tick equal to
    an event timestamp takes THAT event (as-of >=); keys whose span is
    shorter than one step emit nothing; fill always finds a source."""
    from arlas_proc_ray.stages.windows import resample_ffill

    df = pd.DataFrame(
        {
            "k": ["a", "a", "a", "b", "c", "c"],
            "ts": pd.to_datetime(
                [
                    "2024-01-01 00:00:30",  # a: events across 3 ticks
                    "2024-01-01 00:02:00",  # exactly on a tick
                    "2024-01-01 00:03:10",
                    "2024-01-01 00:00:10",  # b: span < 1 min -> no ticks
                    "2024-01-01 00:05:00",  # c: on-tick start and end
                    "2024-01-01 00:06:00",
                ]
            ),
            "v": [1.0, 2.0, 3.0, 9.0, 5.0, 6.0],
        }
    )
    out = (
        resample_ffill(
            rd.from_pandas(df),
            keys=["k"], ts_col="ts", step_s=60, value_cols=["v"],
            num_partitions=3,
        )
        .to_pandas()
        .sort_values(["k", "gts"])
        .reset_index(drop=True)
    )
    a = out[out["k"] == "a"]
    assert list(a["gts"].dt.strftime("%H:%M")) == ["00:01", "00:02", "00:03"]
    assert list(a["v"]) == [1.0, 2.0, 2.0]  # 00:02 tick takes the 00:02 event
    assert (out["k"] == "b").sum() == 0
    c = out[out["k"] == "c"]
    assert list(c["v"]) == [5.0, 6.0]


def test_time_in_state_per_day_splits_midnights_exactly():
    import ray.data as rd

    from arlas_proc_ray.stages.windows import time_in_state_per_day

    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2, 2],
            "ts": pd.to_datetime(
                [
                    "2024-01-01 22:00:00",   # A: 2h on day1, then crosses
                    "2024-01-02 03:00:00",   # B: 3h on day2 (2h A + 3h B)
                    "2024-01-02 06:00:00",   # last: closes nothing
                    "2024-01-01 00:00:00",   # C: exactly 3 full days
                    "2024-01-04 00:00:00",
                ]
            ),
            "state": ["A", "B", "END", "C", "END"],
        }
    )
    out = (
        time_in_state_per_day(
            rd.from_pandas(df).repartition(2), keys=["user_id"],
            ts_col="ts", state_col="state", num_partitions=2,
        )
        .to_pandas()
        .sort_values(["day", "state"])
        .reset_index(drop=True)
    )
    got = {
        (str(r.day)[:10], r.state): r.total_s for r in out.itertuples()
    }
    assert got == {
        ("2024-01-01", "A"): 7200.0,
        ("2024-01-02", "A"): 10800.0,   # midnight→03:00
        ("2024-01-02", "B"): 10800.0,   # 03:00→06:00
        ("2024-01-01", "C"): 86400.0,
        ("2024-01-02", "C"): 86400.0,
        ("2024-01-03", "C"): 86400.0,   # exact-midnight end adds nothing
    }
