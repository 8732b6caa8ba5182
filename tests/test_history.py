"""SCD2 + as-of time travel (cdc/history.py): interval chaining, delete
retraction, current-flag semantics, and LSN-cut reconstruction."""

import pandas as pd
import ray.data as rd

from arlas_proc_ray.cdc.history import as_of_state, scd2_history

CH = pd.DataFrame(
    [
        (1, "UPDATE", "a", "v1"),
        (3, "UPDATE", "a", "v2"),
        (5, "DELETE", "a", None),
        (7, "UPDATE", "a", "v3"),  # reborn after delete
        (2, "UPDATE", "b", "w1"),
        (4, "DELETE", "b", None),
        (6, "UPDATE", "c", "x1"),
    ],
    columns=["lsn", "op", "key", "content"],
)


def _ds():
    return rd.from_pandas(CH.sample(frac=1, random_state=3)).repartition(3)


def test_scd2_intervals_and_current_flag():
    out = (
        scd2_history(
            _ds(), keys=["key"], lsn_col="lsn", op_col="op", num_partitions=4
        )
        .to_pandas()
        .sort_values(["key", "valid_from"])
        .reset_index(drop=True)
    )
    rows = list(
        out[["key", "valid_from", "valid_to", "is_current"]].itertuples(
            index=False, name=None
        )
    )
    assert rows == [
        ("a", 1, 3, False),
        ("a", 3, 5, False),  # closed by the DELETE
        ("a", 7, pd.NA, True),
        ("b", 2, 4, False),  # deleted key: no current row
        ("c", 6, pd.NA, True),
    ] or [
        (k, f, None if pd.isna(t) else t, c) for k, f, t, c in rows
    ] == [
        ("a", 1, 3, False),
        ("a", 3, 5, False),
        ("a", 7, None, True),
        ("b", 2, 4, False),
        ("c", 6, None, True),
    ]


def test_as_of_state_cuts():
    def state(lsn):
        df = (
            as_of_state(
                _ds(),
                keys=["key"],
                lsn_col="lsn",
                op_col="op",
                as_of_lsn=lsn,
                num_partitions=4,
            )
            .to_pandas()
        )
        if df.empty:  # empty Dataset -> frame with no columns
            return {}
        return dict(zip(df["key"], df["content"]))

    assert state(2) == {"a": "v1", "b": "w1"}
    assert state(4) == {"a": "v2"}  # b deleted at 4
    assert state(5) == {}  # a deleted at 5, c not yet born... b gone
    assert state(6) == {"c": "x1"}
    assert state(100) == {"a": "v3", "c": "x1"}
