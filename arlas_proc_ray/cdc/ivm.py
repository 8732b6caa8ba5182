"""Incremental view maintenance — aggregates maintained from CDC deltas.

``incremental_agg_view`` computes per-group aggregates (live-row count,
value sum) of the table state a changelog REPLAYS TO, without ever
materializing that state: each change event, paired with its key's
previous image, contributes signed deltas — retract the previous live
image from its group, assert the new image into its (possibly
different) group. DELETE retracts only; an insert after a delete
asserts only. This is textbook delta-propagation IVM (published
incremental view maintenance literature; the same algebra streaming
engines use for materialized aggregates).

Reference parity: ARLAS-proc recomputes every aggregate from scratch
each run (batch window/groupBy over the re-read slice, e.g.
fragments/FragmentSummaryTransformer.scala) — maintaining the
aggregate from the change stream is the CDC-native replacement.

Scale shape: ONE keyed exchange on the entity key carries the
changelog (the same partitioning the LWW apply uses, so at 100 TB this
runs co-partitioned with — or fused into — the merge stage); each
partition derives per-key previous images with a vectorized groupby
shift and pre-aggregates its deltas per group (combiner), so the
second exchange moves only ``partitions × groups`` tiny delta rows.
Aggregates are sums of signed integers — associative, commutative,
exact (no float residue can fake an empty group).

Correctness contract (SQL-oracled in the catalog): result equals
``SELECT group, count(*), sum(value) FROM <final LWW state> GROUP BY
group`` — the oracle computes the state table, this operator never
does.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

from arlas_proc_ray.stages.keyed import keyed_partition_map


def incremental_agg_view(
    changelog,
    *,
    key: Sequence[str],
    order_col: str,
    op_col: str,
    group_col: str,
    value_col: str | None = None,
    delete_op: str = "DELETE",
    count_name: str = "n_live",
    sum_name: str = "value_sum",
    num_partitions: int = 32,
):
    """Per-group (count, sum) of the state the changelog replays to.

    ``changelog`` rows: entity ``key`` cols, monotone ``order_col``
    (LSN), ``op_col`` (rows equal to ``delete_op`` are deletions, all
    others upsert the row image), ``group_col`` (the dimension the view
    groups by — an update MAY move a key between groups), and optional
    integer ``value_col`` to sum. Groups whose live count is zero are
    absent from the result, exactly like a GROUP BY over the state.
    """
    key = list(key)

    def deltas(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.groupby(key, sort=False)
        live = (pdf[op_col] != delete_op).to_numpy()
        prev_live = (
            g[op_col].shift(1).notna() & (g[op_col].shift(1) != delete_op)
        ).to_numpy()
        grp = pdf[group_col]
        prev_grp = g[group_col].shift(1)
        if value_col is not None:
            val = pdf[value_col].to_numpy()
            prev_val = g[value_col].shift(1).to_numpy()
        parts = []
        # retract the previous live image from its group …
        if prev_live.any():
            neg = pd.DataFrame({group_col: prev_grp.to_numpy()[prev_live]})
            neg["_dn"] = np.int64(-1)
            neg["_dv"] = (
                -prev_val[prev_live].astype(np.int64)
                if value_col is not None
                else np.int64(0)
            )
            parts.append(neg)
        # … assert the new image into its group
        if live.any():
            pos = pd.DataFrame({group_col: grp.to_numpy()[live]})
            pos["_dn"] = np.int64(1)
            pos["_dv"] = (
                val[live].astype(np.int64) if value_col is not None else np.int64(0)
            )
            parts.append(pos)
        if not parts:
            return pd.DataFrame(
                {
                    group_col: pd.Series([], dtype=pdf[group_col].dtype),
                    "_dn": pd.Series([], dtype="int64"),
                    "_dv": pd.Series([], dtype="int64"),
                }
            )
        # partition-local combiner: partitions × groups rows go on the wire
        out = (
            pd.concat(parts, ignore_index=True)
            .groupby(group_col, sort=False, dropna=False)[["_dn", "_dv"]]
            .sum()
            .reset_index()
        )
        return out

    partials = keyed_partition_map(
        changelog,
        keys=key,
        order_col=order_col,
        fn=deltas,
        num_partitions=num_partitions,
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        agg = (
            pdf.groupby(group_col, sort=False, dropna=False)[["_dn", "_dv"]]
            .sum()
            .reset_index()
        )
        agg = agg.loc[agg["_dn"] != 0]
        agg = agg.rename(columns={"_dn": count_name, "_dv": sum_name})
        if value_col is None:
            agg = agg.drop(columns=[sum_name])
        return agg.reset_index(drop=True)

    return keyed_partition_map(
        partials,
        keys=[group_col],
        order_col="_dn",
        fn=fold,
        num_partitions=max(2, num_partitions // 4),
    )


def incremental_moment_view(
    changelog,
    *,
    key: Sequence[str],
    order_col: str,
    live_col: str,
    vec_cols: Sequence[str],
    num_partitions: int = 32,
) -> pd.DataFrame:
    """Second-order moments (count, Σv, Σv⊗v) of the LWW state a
    changelog replays to — the covariance/PCA state maintained by delta
    propagation, never materializing the state table.

    Same algebra as :func:`incremental_agg_view`, lifted from scalars to
    vectors: each change retracts its key's previous LIVE image's
    contributions (−1, −v, −v⊗v) and asserts the new image's (+1, +v,
    +v⊗v) when live; a tombstone (``live_col`` False) asserts nothing.
    Every contribution is exact int64 (callers pass pre-quantized dim
    columns), so retractions cancel bit-for-bit — the float-residue
    failure mode of incremental variance does not exist here.

    Scale shape: ONE keyed exchange on the entity key (co-partitioned
    with the LWW merge); per partition the previous images are one
    vectorized grouped shift, and ±contributions collapse to a single
    (1 + D + D²)-wide partial row per partition via two matmuls. The
    driver merges partition partials in Python big-ints and finalizes
    covariance cells with one exact division each — identical math to
    stages/linalg.py:embedding_covariance on the final state.
    """
    import numpy as np

    from arlas_proc_ray.stages.keyed import keyed_partition_map

    key = list(key)
    vec_cols = list(vec_cols)
    d = len(vec_cols)

    def part(pdf: pd.DataFrame) -> pd.DataFrame:
        V = pdf[vec_cols].to_numpy(np.int64)
        live = pdf[live_col].to_numpy(bool)
        g = pdf.groupby(key, sort=False)
        PV = g[vec_cols].shift(1)
        plive = (
            g[live_col].shift(1).fillna(False).astype(bool).to_numpy()
        )
        pv = PV.fillna(0).to_numpy(np.int64)
        a = V[live]
        r = pv[plive]
        n = int(live.sum()) - int(plive.sum())
        svec = a.sum(axis=0) - r.sum(axis=0)
        souter = a.T @ a - r.T @ r
        import pyarrow as pa

        return pa.table(
            {
                "n": pa.array([n], pa.int64()),
                "svec": pa.array([svec.tolist()], pa.list_(pa.int64())),
                "souter": pa.array(
                    [souter.ravel().tolist()], pa.list_(pa.int64())
                ),
            }
        ).to_pandas()

    partials = keyed_partition_map(
        changelog, keys=key, order_col=order_col, fn=part,
        num_partitions=num_partitions,
    ).to_pandas()

    from arlas_proc_ray.stages.linalg import _merged_sums

    n, svec, souter = _merged_sums(partials)
    if n <= 0:
        return pd.DataFrame(columns=["i", "j", "cov"])
    ii, jj = np.triu_indices(d)
    den = float(n * n)
    cov = [
        float(n * int(souter[i * d + j]) - int(svec[i]) * int(svec[j])) / den
        for i, j in zip(ii, jj)
    ]
    return pd.DataFrame(
        {
            "i": ii.astype(np.int64),
            "j": jj.astype(np.int64),
            "cov": np.array(cov, dtype=np.float64),
        }
    )
