"""Event-sequence analytics — ordered funnels and cohort retention.

Extends the reference's per-key ordered family (§2.4: every
``Window.partitionBy(id).orderBy(ts)`` op, e.g. reference
transform/timeseries/WithStateId.scala:38-60 and the sessionizer in
stages/keyed.py:372) with the two classic event-analytics shapes it
lacks: multi-step conversion funnels and cohort retention matrices.

Scale shape: both are ONE keyed exchange on the user column
(``keyed_partition_map``) — inside a partition every per-user
computation is a vectorized pandas groupby across ALL users at once,
and what leaves the partition is tiny (one row per funnel user; one
(cohort, offset) partial per retention cell). Users are disjoint
across partitions, so retention partials sum exactly.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd

from arlas_proc_ray.stages.keyed import keyed_partition_map


def funnel(
    ds,
    *,
    user_col: str,
    type_col: str,
    ts_col: str,
    steps: Sequence[str],
    num_partitions: int = 64,
):
    """Strictly-ordered first-completion funnel.

    For each user who performed ``steps[0]``, the earliest timestamp of
    each subsequent step that happened strictly AFTER the previous
    step's completion (nullable once the chain breaks). Output: one row
    per step-1 user with a ``{step}_ts`` column per step.
    """
    steps = list(steps)

    def part(pdf: pd.DataFrame) -> pd.DataFrame:
        prev = (
            pdf[pdf[type_col] == steps[0]]
            .groupby(user_col, sort=False)[ts_col]
            .min()
        )
        out = prev.rename(f"{steps[0]}_ts").to_frame()
        for step in steps[1:]:
            sub = pdf.loc[pdf[type_col] == step, [user_col, ts_col]].merge(
                prev.rename("_prev"),
                left_on=user_col,
                right_index=True,
            )
            prev = (
                sub[sub[ts_col] > sub["_prev"]]
                .groupby(user_col, sort=False)[ts_col]
                .min()
            )
            out[f"{step}_ts"] = prev
        return out.reset_index()

    return keyed_partition_map(
        ds,
        keys=[user_col],
        order_col=ts_col,
        fn=part,
        num_partitions=num_partitions,
    )


def transition_counts(
    ds,
    *,
    key_col: str,
    order_col: str,
    state_col: str,
    num_partitions: int = 64,
):
    """First-order transition matrix of ``state_col`` sequences.

    Count of (from_state, to_state) over consecutive events per key —
    the Markov-chain summary behind funnels and next-event prediction.
    One keyed exchange; inside the partition a single vectorized
    ``groupby.shift`` pairs each event with its predecessor, and only
    tiny (from, to, n) partials take the second (small) exchange.
    """

    def part(pdf: pd.DataFrame) -> pd.DataFrame:
        prev = pdf.groupby(key_col, sort=False)[state_col].shift()
        pairs = pd.DataFrame(
            {"from_state": prev, "to_state": pdf[state_col]}
        ).dropna(subset=["from_state"])
        return (
            pairs.groupby(["from_state", "to_state"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )

    partials = keyed_partition_map(
        ds,
        keys=[key_col],
        order_col=order_col,
        fn=part,
        num_partitions=num_partitions,
    )

    def reduce_sum(pdf: pd.DataFrame) -> pd.DataFrame:
        return (
            pdf.groupby(["from_state", "to_state"], sort=False)["n"]
            .sum()
            .reset_index()
        )

    return keyed_partition_map(
        partials,
        keys=["from_state"],
        order_col="to_state",
        fn=reduce_sum,
        num_partitions=min(4, num_partitions),
    )


def week_start(ts: pd.Series) -> pd.Series:
    """Monday-00:00 truncation, matching DuckDB ``date_trunc('week', ts)``."""
    d = ts.dt.normalize()
    return d - pd.to_timedelta(ts.dt.dayofweek, unit="D")


def cohort_retention(
    ds,
    *,
    user_col: str,
    ts_col: str,
    num_partitions: int = 64,
):
    """Weekly cohort retention matrix.

    Cohort = Monday-start week of a user's first event; one output row
    per (cohort_week, week_offset) with the count of distinct users from
    that cohort active in that week. Per-partition partials are exact
    (users are disjoint across partitions) and the final sum over
    ``num_partitions × cells`` rows is a second, tiny keyed exchange.
    """

    def part(pdf: pd.DataFrame) -> pd.DataFrame:
        wk = week_start(pdf[ts_col])
        act = pd.DataFrame(
            {user_col: pdf[user_col], "_wk": wk}
        ).drop_duplicates()
        cw = act.groupby(user_col, sort=False)["_wk"].transform("min")
        cells = pd.DataFrame(
            {
                "cohort_week": cw,
                "week_offset": ((act["_wk"] - cw).dt.days // 7).astype(
                    "int64"
                ),
            }
        )
        return (
            cells.groupby(["cohort_week", "week_offset"], sort=False)
            .size()
            .rename("active_users")
            .reset_index()
        )

    partials = keyed_partition_map(
        ds,
        keys=[user_col],
        order_col=ts_col,
        fn=part,
        num_partitions=num_partitions,
    )

    def reduce_sum(pdf: pd.DataFrame) -> pd.DataFrame:
        return (
            pdf.groupby(["cohort_week", "week_offset"], sort=False)[
                "active_users"
            ]
            .sum()
            .reset_index()
        )

    return keyed_partition_map(
        partials,
        keys=["cohort_week"],
        order_col="week_offset",
        fn=reduce_sum,
        num_partitions=min(4, num_partitions),
    )
