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
    # normalize the null representation BEFORE comparing: the sort path
    # hands back the masked-Int64 pd.NA singleton (tuple compare passes
    # by identity) while the staged path's Arrow round-trip yields NaN,
    # whose == against pd.NA raises "boolean value of NA is ambiguous"
    norm = [
        (k, int(f), None if pd.isna(t) else int(t), bool(c))
        for k, f, t, c in rows
    ]
    assert norm == [
        ("a", 1, 3, False),
        ("a", 3, 5, False),  # closed by the DELETE
        ("a", 7, None, True),
        ("b", 2, 4, False),  # deleted key: no current row
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


def test_temporal_join_matches_version_at_lsn():
    from arlas_proc_ray.cdc.history import scd2_history, temporal_join

    versions = scd2_history(
        _ds(), keys=["key"], lsn_col="lsn", op_col="op", num_partitions=4
    ).drop_columns(["is_current"])
    facts = pd.DataFrame(
        [(2, "q", "a"), (4, "q", "a"), (6, "q", "a"), (8, "q", "a"),
         (3, "q", "b"), (5, "q", "b"), (7, "q", "c")],
        columns=["lsn", "op", "key"],
    )
    out = (
        temporal_join(
            rd.from_pandas(facts).repartition(2),
            versions,
            keys=["key"],
            lsn_col="lsn",
            version_value_cols=["content"],
            num_partitions=4,
        )
        .to_pandas()
        .sort_values(["key", "lsn"])
        .reset_index(drop=True)
    )
    got = list(zip(out["key"], out["lsn"], out["content_v"]))
    # a: v1@[1,3), v2@[3,5), deleted@5, v3@[7,inf)
    # b: w1@[2,4), deleted@4 ; c: x1@[6,inf)
    assert got == [
        ("a", 2, "v1"),
        ("a", 4, "v2"),
        # lsn 6 falls in a's delete gap -> dropped
        ("a", 8, "v3"),
        ("b", 3, "w1"),
        # b lsn 5 after delete -> dropped
        ("c", 7, "x1"),
    ]


def test_transition_counts_exact():
    from arlas_proc_ray.stages.analytics import transition_counts

    df = pd.DataFrame(
        [("u", 1, "A"), ("u", 2, "B"), ("u", 3, "A"), ("u", 4, "B"),
         ("w", 1, "B"), ("w", 2, "A")],
        columns=["k", "o", "s"],
    )
    out = (
        transition_counts(
            rd.from_pandas(df.sample(frac=1, random_state=7)).repartition(3),
            key_col="k",
            order_col="o",
            state_col="s",
            num_partitions=4,
        )
        .to_pandas()
        .sort_values(["from_state", "to_state"])
        .reset_index(drop=True)
    )
    got = {(r["from_state"], r["to_state"]): r["n"] for _, r in out.iterrows()}
    assert got == {("A", "B"): 2, ("B", "A"): 2}
