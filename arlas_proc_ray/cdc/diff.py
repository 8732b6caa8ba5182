"""Snapshot diff — the INVERSE of CDC apply.

``snapshot_diff(old_ds, new_ds, key=..., compare=...)`` takes two table
states (e.g. yesterday's snapshot and today's) and emits the minimal
changelog that transforms one into the other: one row per changed key
with ``op`` ∈ {'I','U','D'}. Applying the emitted changes to ``old``
via the LWW engine reproduces ``new`` — the round-trip property pinned
in tests.

Reference parity: ARLAS-proc has no diff operator (its pipelines always
re-ingest full extracts); this is the missing half of a CDC engine —
bootstrapping a change stream from periodic full snapshots
(DBLog/Netflix-style full-fetch reconciliation, published design).

Scale shape: both snapshots are tagged and exchanged together in ONE
hash co-partition on the key (the same union trick as
``stages/joins.py:equi_join``); each partition classifies its keys with
three vectorized merges (key-frame outer merge with indicator →
insert/delete/matched masks → null-safe compare of the matched block).
Nothing is broadcast or driver-resident; each snapshot moves exactly
once. Partitioning assumption: one key's rows (both sides) fit one
partition — trivially true for snapshots, which hold ≤1 row per key.

Dtype discipline: classification runs on byte-exact integer key codes
(Arrow ``dictionary_encode`` via ``cdc.replay.group_ids`` — the same
kernel the LWW engine groups with, so NUL-embedded keys stay distinct
where a pandas merge would collapse them), and output rows are selected
positionally (``iloc``) from the partition frame, so payload columns
never take the pandas NaN→float64 upcast; I/U images come straight from
the ``new`` block and D images from ``old`` with their original dtypes
(int64 LSNs survive beyond 2^53).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

from arlas_proc_ray.stages.joins import _arrow_schema, _side_rows
from arlas_proc_ray.stages.keyed import keyed_partition_map


def _null_safe_neq(a: pd.Series, b: pd.Series) -> np.ndarray:
    """Vectorized IS DISTINCT FROM (NaN == NaN, unlike ``!=``)."""
    an, bn = a.isna().to_numpy(), b.isna().to_numpy()
    neq = (a.to_numpy(object) != b.to_numpy(object)) if a.dtype == object else (
        a.to_numpy() != b.to_numpy()
    )
    # NaN != NaN is True in numpy; repair: differ iff exactly one is null,
    # or neither is null and values differ.
    return (an ^ bn) | (~an & ~bn & neq)


def snapshot_diff(
    old_ds,
    new_ds,
    *,
    key: Sequence[str],
    compare: Sequence[str],
    op_col: str = "op",
    lsn_col: str | None = None,
    num_partitions: int = 32,
):
    """Changelog between two snapshots: one row per inserted ('I'),
    updated ('U', any ``compare`` column IS DISTINCT FROM its old value)
    or deleted ('D') key. The image columns carry the NEW values for
    I/U and the OLD values for D (what a consumer needs to apply or to
    tombstone). Unchanged keys emit nothing.

    Without ``lsn_col`` both inputs must hold at most one row per key
    (they are snapshots); duplicate keys raise rather than guess. With
    ``lsn_col`` each input may be a RAW change stream: a per-batch LWW
    combiner collapses each block to one row per key before the
    exchange, and each side is LWW-reduced (max ``lsn_col`` wins) inside
    the partition before classifying — two streams are snapshotted AND
    diffed in the SAME single exchange, no per-side snapshot shuffle.
    """
    key = list(key)
    compare = list(compare)
    cols = key + compare
    extra_lsn = lsn_col is not None and lsn_col not in cols
    ucols = cols + ([lsn_col] if extra_lsn else [])
    order_col = lsn_col if lsn_col is not None else "_side"

    o_schema = _arrow_schema(old_ds)
    union_schema = pa.schema([o_schema.field(c) for c in ucols])

    if lsn_col is not None:
        from arlas_proc_ray.cdc.replay import lww_reduce_table

        def old_rows(batch: pa.Table) -> pa.Table:
            batch = lww_reduce_table(batch.select(ucols), key, lsn_col)
            return _side_rows(batch, union_schema, 0)

        def new_rows(batch: pa.Table) -> pa.Table:
            batch = lww_reduce_table(batch.select(ucols), key, lsn_col)
            return _side_rows(batch, union_schema, 1)
    else:

        def old_rows(batch: pa.Table) -> pa.Table:
            return _side_rows(batch.select(ucols), union_schema, 0)

        def new_rows(batch: pa.Table) -> pa.Table:
            return _side_rows(batch.select(ucols), union_schema, 1)

    union = old_ds.map_batches(
        old_rows, batch_format="pyarrow", batch_size=None
    ).union(
        new_ds.map_batches(new_rows, batch_format="pyarrow", batch_size=None)
    )

    def classify(pdf: pd.DataFrame) -> pd.DataFrame:
        from arlas_proc_ray.cdc.replay import group_ids

        # Byte-exact dense key codes over the WHOLE partition frame (both
        # sides share one code space) — pandas merge/index lookups NUL-merge
        # string keys, so all set logic below runs on these int codes.
        key_tbl = pa.table(
            {c: pa.Array.from_pandas(pdf[c]) for c in key}
        )
        codes = group_ids(key_tbl, key)
        is_new = pdf["_side"].to_numpy() == 1
        old_pos, new_pos = np.flatnonzero(~is_new), np.flatnonzero(is_new)
        oc, nc = codes[old_pos], codes[new_pos]
        # stable sort by code: within a code the (key…, lsn) upstream sort
        # order survives, so 'last of run' is the max-lsn row
        for _arr in ("o", "n"):
            pos, c = (old_pos, oc) if _arr == "o" else (new_pos, nc)
            order = np.argsort(c, kind="stable")
            if _arr == "o":
                old_pos, oc = pos[order], c[order]
            else:
                new_pos, nc = pos[order], c[order]
        if lsn_col is not None:
            keep_o = np.append(oc[1:] != oc[:-1], True) if len(oc) else np.zeros(0, bool)
            keep_n = np.append(nc[1:] != nc[:-1], True) if len(nc) else np.zeros(0, bool)
            old_pos, oc = old_pos[keep_o], oc[keep_o]
            new_pos, nc = new_pos[keep_n], nc[keep_n]
        elif (len(oc) and (oc[1:] == oc[:-1]).any()) or (
            len(nc) and (nc[1:] == nc[:-1]).any()
        ):
            raise ValueError("snapshot_diff inputs must be unique per key")
        # oc / nc are now sorted unique → classify with searchsorted set ops
        ins_mask = ~np.isin(nc, oc)
        del_mask = ~np.isin(oc, nc)
        common_new_pos = new_pos[~ins_mask]
        common_old_pos = old_pos[np.searchsorted(oc, nc[~ins_mask])]
        changed = np.zeros(len(common_new_pos), dtype=bool)
        for c in compare:
            changed |= _null_safe_neq(
                pdf[c].iloc[common_old_pos], pdf[c].iloc[common_new_pos]
            )
        out_pos = np.concatenate(
            [new_pos[ins_mask], common_new_pos[changed], old_pos[del_mask]]
        )
        ops = np.concatenate(
            [
                np.full(int(ins_mask.sum()), "I", dtype=object),
                np.full(int(changed.sum()), "U", dtype=object),
                np.full(int(del_mask.sum()), "D", dtype=object),
            ]
        )
        if not len(out_pos):
            # Arrow typed empty (run_group passes it through): Ray's
            # pandas block sizing can't handle zero-length object columns
            return pa.table(
                {**{c: pa.array([], union_schema.field(c).type) for c in cols},
                 op_col: pa.array([], pa.string())}
            )
        out = pdf.iloc[out_pos][cols].copy()
        out[op_col] = ops
        return out.reset_index(drop=True)

    return keyed_partition_map(
        union, keys=key, order_col=order_col, fn=classify,
        num_partitions=num_partitions,
    )
