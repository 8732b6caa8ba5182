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
            # merge on a materialized column, not right_index=True: with an
            # empty side pandas can name the result's INDEX ``user_col``,
            # making the later groupby(user_col) ambiguous (index level vs
            # column label) — partition-layout dependent, caught when the
            # key-routing fix redistributed groups.
            prev_df = prev.rename("_prev").rename_axis(user_col).reset_index()
            sub = pdf.loc[pdf[type_col] == step, [user_col, ts_col]].merge(
                prev_df, on=user_col
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


# ---------------------------------------------------------------------------
# Pivot / unpivot / rollup
# ---------------------------------------------------------------------------


def pivot_agg(
    ds,
    *,
    key_col: str,
    category_col: str,
    value_col: str,
    categories: Sequence[str],
    agg: str = "sum",
    num_partitions: int = 16,
):
    """Rows → one column per category (Spark ``groupBy().pivot().agg()``),
    with integer-exact sums/counts.

    The category list is EXPLICIT (as Spark recommends for determinism —
    an inferred list is a extra distinct pass): unknown categories are
    ignored, absent (key, category) cells are 0. Combiner-first: every
    batch collapses to ≤ |keys in batch| wide partial rows inside
    ``map_batches``, then ONE keyed exchange sums partials per key —
    category count never affects the shuffle row count.

    ``agg``: 'sum' (int64-exact) or 'count'.
    """
    import numpy as np
    import pyarrow as pa

    if agg not in ("sum", "count"):
        raise ValueError(f"agg must be 'sum' or 'count', got {agg!r}")
    cats = list(categories)
    out_cols = [f"{category_col}_{c}" for c in cats]

    def partial(pdf: pd.DataFrame) -> pd.DataFrame:
        # factorize + flat bincount: pd.crosstab/pivot_table take a
        # pure-Python per-group agg path (~10× slower on a 100k-row batch)
        keys_all = pdf[key_col].to_numpy()
        ku, key_inv = np.unique(keys_all, return_inverse=True)
        ci = pd.Categorical(
            pdf[category_col], categories=cats
        ).codes.astype(np.int64)  # -1 = not in the explicit category list
        sel = ci >= 0
        flat = key_inv[sel] * len(cats) + ci[sel]
        m = np.zeros(len(ku) * len(cats), dtype=np.int64)
        if agg == "count":
            cnt = np.bincount(flat, minlength=len(m))
            m[: len(cnt)] = cnt
        else:
            # int64-exact grouped sum (bincount weights would go float64)
            sums = pd.Series(pdf[value_col].to_numpy()[sel]).groupby(
                flat, sort=False
            ).sum()
            m[sums.index.to_numpy()] = sums.to_numpy()
        wide = pd.DataFrame(
            m.reshape(len(ku), len(cats)), columns=out_cols
        )
        wide.insert(0, key_col, ku)
        return wide

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=None)

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf.groupby(key_col, as_index=False, sort=False)[out_cols].sum()

    return keyed_partition_map(
        partials, keys=[key_col], order_col=out_cols[0], fn=merge,
        num_partitions=num_partitions,
    )


def unpivot(ds, *, id_cols: Sequence[str], value_cols: Sequence[str],
            var_name: str = "variable", value_name: str = "value"):
    """Columns → rows (``melt`` / SQL UNPIVOT): pure per-batch reshape,
    no shuffle at all — each batch melts independently."""
    id_cols, value_cols = list(id_cols), list(value_cols)

    def melt(pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf.melt(
            id_vars=id_cols, value_vars=value_cols,
            var_name=var_name, value_name=value_name,
        )

    return ds.map_batches(melt, batch_format="pandas", batch_size=None)


def rollup_counts(
    ds,
    *,
    group_cols: Sequence[str],
    cents_col: str,
    num_partitions: int = 16,
):
    """GROUP BY ROLLUP(g1, g2, …): totals at every prefix level, exact
    integer-cents sums.

    Scale shape: ONE aggregation at the finest level (combiner + keyed
    exchange); every coarser level is derived from the finest AGGREGATE
    (≤ |finest groups| rows) on the driver — the raw data is read and
    shuffled exactly once however many levels the rollup has. NULL marks
    the rolled-up position (SQL ROLLUP semantics).
    """
    import numpy as np

    group_cols = list(group_cols)

    def partial(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.groupby(group_cols, as_index=False, sort=False)
        out = g.agg(_c=(cents_col, "sum"), _n=(cents_col, "size"))
        out["_n"] = out["_n"].astype(np.int64)
        return out

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=None)

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf.groupby(group_cols, as_index=False, sort=False)[
            ["_c", "_n"]
        ].sum()

    finest = keyed_partition_map(
        partials, keys=group_cols, order_col="_c", fn=merge,
        num_partitions=num_partitions,
    ).to_pandas()  # ≤ |finest groups| rows — tiny driver finalize

    levels = [finest]
    for depth in range(len(group_cols) - 1, -1, -1):
        keep = group_cols[:depth]
        if keep:
            lvl = finest.groupby(keep, as_index=False, sort=False)[
                ["_c", "_n"]
            ].sum()
        else:
            lvl = pd.DataFrame(
                {"_c": [finest["_c"].sum()], "_n": [finest["_n"].sum()]}
            )
        for c in group_cols[depth:]:
            lvl[c] = None
        levels.append(lvl[group_cols + ["_c", "_n"]])
    out = pd.concat(levels, ignore_index=True)
    out = out.rename(columns={"_c": "sum_cents", "_n": "n_rows"})
    out["n_rows"] = out["n_rows"].astype("int64")
    return out


def journey_paths(
    ds,
    *,
    key_col: str,
    step_col: str,
    order_col: str,
    sep: str = ">",
    num_partitions: int = 16,
):
    """Per-key ordered step sequence as one string (the classic "user
    journey" / path analysis shape): one keyed exchange, then a
    vectorized groupby-join inside each partition.

    Returns (key, journey, n_steps)."""

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.groupby(key_col, sort=False)
        out = g[step_col].agg(lambda s: sep.join(s.astype(str))).reset_index()
        out.columns = [key_col, "journey"]
        out["n_steps"] = g.size().to_numpy()
        return out

    return keyed_partition_map(
        ds, keys=[key_col], order_col=order_col, fn=fold,
        num_partitions=num_partitions,
    )


def group_covariance(
    ds,
    *,
    group_col: str,
    x_col: str,
    y_col: str,
    num_partitions: int = 8,
):
    """Population covariance per group from EXACT integer moments.

    x and y must already be integers (e.g. cents): each batch collapses
    to one (group, n, Σx, Σy, Σxy) partial — associative int sums, so
    the keyed merge is order-free and retry-safe — and the final value
    is float(n·Σxy − Σx·Σy) / float(n²), the same double-from-exact-int
    division DuckDB computes. Σxy must fit int64 (caller contract; at
    larger magnitudes pre-scale)."""
    import numpy as np

    def partial(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.assign(_xy=pdf[x_col].to_numpy() * pdf[y_col].to_numpy())
        g = pdf.groupby(group_col, sort=False)
        out = pd.DataFrame(
            {
                "n": g.size(),
                "sx": g[x_col].sum(),
                "sy": g[y_col].sum(),
                "sxy": g["_xy"].sum(),
            }
        ).reset_index()
        for c in ("n", "sx", "sy", "sxy"):
            out[c] = out[c].astype(np.int64)
        return out

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=None)

    def finalize(pdf: pd.DataFrame) -> pd.DataFrame:
        m = pdf.groupby(group_col, sort=False, as_index=False)[
            ["n", "sx", "sy", "sxy"]
        ].sum()
        num = (m["n"] * m["sxy"] - m["sx"] * m["sy"]).to_numpy(object)
        den = (m["n"] * m["n"]).to_numpy(object)
        m["cov_pop"] = [float(a) / float(b) for a, b in zip(num, den)]
        return m[[group_col, "n", "cov_pop"]]

    return keyed_partition_map(
        partials, keys=[group_col], order_col="n", fn=finalize,
        num_partitions=num_partitions,
    )


def group_correlation(
    ds,
    *,
    group_col: str,
    x_col: str,
    y_col: str,
    num_partitions: int = 8,
):
    """Pearson correlation per group from EXACT integer moments.

    Like ``group_covariance`` but also carries Σx² and Σy². Per-batch
    partial sums are int64 (per-batch magnitudes are the caller's
    contract); the per-group merge promotes to Python ints (arbitrary
    precision — no overflow at any corpus scale), and the finalize is

        float(n·Σxy − Σx·Σy) / sqrt(float(n·Σx²−Σx²) · float(n·Σy²−Σy²))

    — the same double-from-exact-int expression the SQL oracle computes
    over HUGEINT sums, so results match bitwise."""
    import math

    import numpy as np

    def partial(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[x_col].to_numpy()
        y = pdf[y_col].to_numpy()
        pdf = pdf.assign(_xy=x * y, _xx=x * x, _yy=y * y)
        g = pdf.groupby(group_col, sort=False)
        out = pd.DataFrame(
            {
                "n": g.size(),
                "sx": g[x_col].sum(),
                "sy": g[y_col].sum(),
                "sxy": g["_xy"].sum(),
                "sxx": g["_xx"].sum(),
                "syy": g["_yy"].sum(),
            }
        ).reset_index()
        for c in ("n", "sx", "sy", "sxy", "sxx", "syy"):
            out[c] = out[c].astype(np.int64)
        return out

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=None)
    cols = ["n", "sx", "sy", "sxy", "sxx", "syy"]

    def finalize(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.copy()
        pdf[cols] = pdf[cols].astype(object)  # Python-int exact merge
        m = pdf.groupby(group_col, sort=False, as_index=False)[cols].sum()
        num = m["n"] * m["sxy"] - m["sx"] * m["sy"]
        vx = m["n"] * m["sxx"] - m["sx"] * m["sx"]
        vy = m["n"] * m["syy"] - m["sy"] * m["sy"]
        m["corr"] = [
            float(a) / math.sqrt(float(b) * float(c)) if b > 0 and c > 0 else None
            for a, b, c in zip(num, vx, vy)
        ]
        m["n"] = m["n"].astype("int64")
        return m[[group_col, "n", "corr"]]

    return keyed_partition_map(
        partials, keys=[group_col], order_col="n", fn=finalize,
        num_partitions=num_partitions,
    )


def cube_counts(
    ds,
    *,
    group_cols: Sequence[str],
    cents_col: str,
    num_partitions: int = 16,
):
    """GROUP BY CUBE(g1, g2, …): totals at EVERY subset of the group
    columns, exact integer-cents sums.

    Same scale shape as ``rollup_counts``: one combiner-first
    aggregation at the finest level (the only scan and the only
    exchange), then every one of the 2^k − 1 coarser subsets derives
    from the finest AGGREGATE on the driver (≤ |finest groups| rows
    each). NULL marks a rolled-up position (SQL CUBE semantics).
    """
    from itertools import combinations

    import numpy as np

    group_cols = list(group_cols)

    def partial(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.groupby(group_cols, as_index=False, sort=False)
        out = g.agg(_c=(cents_col, "sum"), _n=(cents_col, "size"))
        out["_n"] = out["_n"].astype(np.int64)
        return out

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=None)

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf.groupby(group_cols, as_index=False, sort=False)[
            ["_c", "_n"]
        ].sum()

    finest = keyed_partition_map(
        partials, keys=group_cols, order_col="_c", fn=merge,
        num_partitions=num_partitions,
    ).to_pandas()  # ≤ |finest groups| rows — tiny driver finalize

    levels = [finest]
    for r in range(len(group_cols) - 1, -1, -1):
        for keep in combinations(group_cols, r):
            keep = list(keep)
            if keep:
                lvl = finest.groupby(keep, as_index=False, sort=False)[
                    ["_c", "_n"]
                ].sum()
            else:
                lvl = pd.DataFrame(
                    {"_c": [finest["_c"].sum()],
                     "_n": [finest["_n"].sum()]}
                )
            for c in group_cols:
                if c not in keep:
                    lvl[c] = None
            levels.append(lvl[group_cols + ["_c", "_n"]])
    out = pd.concat(levels, ignore_index=True)
    out = out.rename(columns={"_c": "sum_cents", "_n": "n_rows"})
    out["n_rows"] = out["n_rows"].astype("int64")
    return out


def category_affinity(
    ds,
    *,
    id_col: str,
    cat_col: str,
    num_partitions: int = 16,
) -> pd.DataFrame:
    """Pairwise category affinity (co-occurrence + Jaccard) over entity
    category-sets — the market-basket / item-similarity primitive.

    For every unordered category pair (a < b): the number of entities
    carrying both, the union size, and Jaccard = |∩| / |∪|.

    Scale shape: ONE keyed exchange on ``id_col`` (entities are disjoint
    across partitions, so per-partition distinct (entity, category) is
    globally correct); inside each partition a single self-merge across
    all entities at once emits pair partials, and only category-pair
    rows (≤ |C|² per partition) leave the partition for a tiny driver
    sum. Contract: the CATEGORY domain is bounded (per-partition work is
    entities × |C|²) — the same small-side assumption as every broadcast
    join here; unbounded domains belong to minhash/ngram pair mining
    (dedup/).

    Jaccard is one division of exact int64 counts — bit-identical to a
    SQL oracle's, no rounding needed.
    """
    import numpy as np

    def part(pdf: pd.DataFrame) -> pd.DataFrame:
        from arlas_proc_ray.stages.keyed import byte_exact_group_cols

        ut = byte_exact_group_cols(
            pdf[[id_col, cat_col]].copy(), [cat_col]
        ).drop_duplicates()
        singles = ut.groupby(cat_col, sort=False).size()
        m = ut.merge(ut, on=id_col)
        xa, xb = f"{cat_col}_x", f"{cat_col}_y"
        m = m[m[xa] < m[xb]]
        pairs = m.groupby([xa, xb], sort=False).size().reset_index(name="n")
        out = pd.DataFrame(
            {
                "type_a": pd.concat(
                    [pairs[xa], pd.Series(singles.index)], ignore_index=True
                ).astype(object),
                "type_b": pd.concat(
                    [
                        pairs[xb],
                        pd.Series([""] * len(singles)),
                    ],
                    ignore_index=True,
                ).astype(object),
                "n": np.concatenate(
                    [pairs["n"].to_numpy(np.int64), singles.to_numpy(np.int64)]
                ),
            }
        )
        return out

    partials = keyed_partition_map(
        ds, keys=[id_col], order_col=cat_col, fn=part,
        num_partitions=num_partitions,
    ).to_pandas()
    if partials.empty:
        return pd.DataFrame(
            columns=["type_a", "type_b", "co_users", "union_users", "jaccard"]
        )
    from arlas_proc_ray.stages.keyed import byte_exact_group_cols

    partials = byte_exact_group_cols(partials, ["type_a", "type_b"])
    tot = partials.groupby(["type_a", "type_b"], sort=False)["n"].sum()
    singles = tot.xs("", level="type_b")
    pairs = tot[tot.index.get_level_values("type_b") != ""].reset_index()
    na = pairs["type_a"].map(singles).to_numpy(np.int64)
    nb = pairs["type_b"].map(singles).to_numpy(np.int64)
    co = pairs["n"].to_numpy(np.int64)
    union = na + nb - co
    return pd.DataFrame(
        {
            "type_a": pairs["type_a"],
            "type_b": pairs["type_b"],
            "co_users": co,
            "union_users": union,
            "jaccard": co / union,
        }
    )


def last_touch_attribution(
    ds,
    *,
    key_col: str,
    order_col: str,
    type_col: str,
    conv_type: str,
    cents_col: str,
    num_partitions: int = 16,
) -> pd.DataFrame:
    """Last-touch conversion attribution: each ``conv_type`` event is
    credited to the most recent PRIOR event of any other type by the
    same key; conversions with no prior touch are unattributed (dropped).

    Scale shape: one keyed exchange on ``key_col``; inside a partition
    the carry-forward is two vectorized grouped passes (shift(1) then
    ffill — "last non-conversion type strictly before this row") across
    all keys at once, and only per-touch-type totals (≤ |types| rows)
    leave each partition for a tiny driver sum. Value totals are exact
    integer cents end-to-end.
    """
    import numpy as np

    def part(pdf: pd.DataFrame) -> pd.DataFrame:
        from arlas_proc_ray.stages.keyed import byte_exact_group_cols

        t = pdf[type_col].where(pdf[type_col] != conv_type)
        prev = t.groupby(pdf[key_col], sort=False).shift(1)
        touch = prev.groupby(pdf[key_col], sort=False).ffill()
        conv = (pdf[type_col] == conv_type) & touch.notna()
        sub = byte_exact_group_cols(
            pd.DataFrame(
                {"touch_type": touch[conv], "cents": pdf.loc[conv, cents_col]}
            ),
            ["touch_type"],
        )
        agg = sub.groupby("touch_type", sort=False)["cents"].agg(
            ["size", "sum"]
        )
        return pd.DataFrame(
            {
                "touch_type": agg.index.to_numpy(object),
                "conversions": agg["size"].to_numpy(np.int64),
                "cents": agg["sum"].to_numpy(np.int64),
            }
        )

    partials = keyed_partition_map(
        ds, keys=[key_col], order_col=order_col, fn=part,
        num_partitions=num_partitions,
    ).to_pandas()
    if partials.empty:
        return pd.DataFrame(
            columns=["touch_type", "conversions", "attributed_value"]
        )
    from arlas_proc_ray.stages.keyed import byte_exact_group_cols

    partials = byte_exact_group_cols(partials, ["touch_type"])
    agg = partials.groupby("touch_type", sort=False)[["conversions", "cents"]].sum()
    return pd.DataFrame(
        {
            "touch_type": agg.index.to_numpy(object),
            "conversions": agg["conversions"].to_numpy("int64"),
            "attributed_value": agg["cents"].to_numpy("int64") / 100.0,
        }
    )


def sequence_pattern_counts(
    ds,
    *,
    key_col: str,
    order_col: str,
    type_col: str,
    symbol_of: dict,
    pattern: str,
    num_partitions: int = 16,
) -> "object":
    """Complex-event-processing primitive: count non-overlapping regex
    matches over each key's ORDERED event-type sequence, encoded one
    symbol per event via ``symbol_of`` (keep symbols single-char and the
    pattern backreference-free so RE2-based SQL oracles agree with
    Python ``re`` — both scan leftmost, non-overlapping).

    Scale shape: one keyed exchange; per partition the symbol encoding
    is one vectorized map, the per-key string build is a grouped join
    (output is key-sized), and the match count one vectorized
    ``str.count``. Contract: a key's full sequence lives in one
    partition row — bound per-key event counts upstream (throttle /
    sessionize) if a key can be unbounded.

    Keys with zero matches are dropped (sparse output).
    """
    import numpy as np

    def part(pdf: pd.DataFrame) -> pd.DataFrame:
        sym = pdf[type_col].map(symbol_of)
        if sym.isna().any():
            missing = sorted(pdf.loc[sym.isna(), type_col].unique())
            raise ValueError(f"no symbol for event types: {missing}")
        seq = sym.groupby(pdf[key_col], sort=False).agg("".join)
        n = seq.str.count(pattern)
        out = pd.DataFrame(
            {
                key_col: seq.index.to_numpy(),
                "n_matches": n.to_numpy(np.int64),
            }
        )
        return out[out["n_matches"] > 0].reset_index(drop=True)

    return keyed_partition_map(
        ds, keys=[key_col], order_col=order_col, fn=part,
        num_partitions=num_partitions,
    )


def lead_lag_correlation(
    x: pd.Series, y: pd.Series, *, lags: Sequence[int]
) -> pd.DataFrame:
    """Pearson correlation of two integer-valued series at several leads
    and lags: for each ``lag``, r over aligned pairs (x_t, y_{t+lag})
    within the shared index span, missing ticks as 0.

    All sums are exact integers; r is the textbook single expression
    ``(n·Σxy − ΣxΣy) / (√(n·Σxx − Σx²) · √(n·Σyy − Σy²))`` — every
    float op (int→double casts, two IEEE-correctly-rounded sqrts, one
    multiply, one divide) appears in the same order in the SQL oracle,
    so results are bit-identical. Degenerate lags (a constant series in
    the overlap) are dropped.

    Driver-side finalize over tick-sized series — the distributed work
    is the per-tick aggregation that produced them.
    """
    import numpy as np

    lo = min(int(x.index.min()), int(y.index.min()))
    hi = max(int(x.index.max()), int(y.index.max()))
    grid = np.arange(lo, hi + 1, dtype=np.int64)
    xv = x.reindex(grid, fill_value=0).to_numpy(np.int64)
    yv = y.reindex(grid, fill_value=0).to_numpy(np.int64)
    rows = []
    for lag in lags:
        # pairs (x_t, y_{t+lag}) with both indices on the grid
        if lag >= 0:
            a, b = xv[: len(xv) - lag or None], yv[lag:]
        else:
            a, b = xv[-lag:], yv[: len(yv) + lag]
        n = len(a)
        if n == 0:
            continue
        sx, sy = int(a.sum()), int(b.sum())
        sxx = int((a * a).sum())
        syy = int((b * b).sum())
        sxy = int((a * b).sum())
        da = n * sxx - sx * sx
        db = n * syy - sy * sy
        if da == 0 or db == 0:
            continue
        r = float(n * sxy - sx * sy) / (
            np.sqrt(float(da)) * np.sqrt(float(db))
        )
        rows.append((lag, n, r))
    return pd.DataFrame(rows, columns=["lag", "n_days", "r"]).astype(
        {"lag": "int64", "n_days": "int64"}
    )


def skyline(
    ds,
    *,
    dims: Sequence[str],
    keep_cols: Sequence[str] = (),
):
    """Distributed skyline (Pareto frontier, maximizing every dim).

    A row p dominates q iff p ≥ q on ALL ``dims`` and > on at least
    one; the skyline is the set no row dominates. The algebraic gift is
    that skyline(A ∪ B) = skyline(skyline(A) ∪ skyline(B)) — a pure
    combiner: each block reduces to its local frontier inside
    ``map_batches``, and the driver finishes on the union of local
    frontiers (skyline-sized — O(log^{d-1} n) expected on independent
    dims, the classic Bentley bound; never the input). Dominance tests
    are vectorized O(n·s) numpy passes (each candidate against the
    current frontier), integer-exact on integer dims.

    Duplicated points (equal on every dim) dominate nothing and are all
    kept, mirroring SQL NOT EXISTS semantics. Returns a pandas frame of
    ``keep_cols + dims``.
    """
    import numpy as np

    dims = list(dims)
    cols = [c for c in keep_cols if c not in dims] + dims

    def _frontier(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) <= 1:
            return pdf[cols]
        m = pdf[dims].to_numpy()
        # sort by dim-0 desc: a point can only be dominated by an
        # earlier point (or a dim-0 tie), which bounds each pass to the
        # kept frontier so far
        order = np.lexsort(tuple(m[:, i] for i in range(len(dims))))[::-1]
        m = m[order]
        kept_idx: list[int] = []
        kept_rows: list[np.ndarray] = []
        for i in range(len(m)):
            if kept_rows:
                f = np.asarray(kept_rows)
                ge = (f >= m[i]).all(axis=1)
                gt = (f > m[i]).any(axis=1)
                if (ge & gt).any():
                    continue
            kept_idx.append(order[i])
            kept_rows.append(m[i])
        return pdf.iloc[sorted(kept_idx)][cols]

    local = ds.map_batches(
        lambda pdf: _frontier(pdf),
        batch_format="pandas",
        batch_size=None,
    ).to_pandas()  # ≤ blocks × local-frontier size (skyline-sized)
    return _frontier(local.reset_index(drop=True)).reset_index(drop=True)
