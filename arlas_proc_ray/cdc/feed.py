"""Change data feed — the store's changelog between two epochs, as a Dataset.

``change_feed(store, base=…, target=…)`` exposes WHAT CHANGED between
any two committed epochs as a streaming ``ray.data.Dataset`` of I/U/D
rows — the table-format "change data feed" (Delta CDF / Iceberg
changelog scan shape), derived here without ever storing a changelog:
both epochs share the store's hash fan-out, so partition ``p`` holds the
same key range in both states and one task per partition classifies
locally with the same vectorized kernel the search-index publish uses
(``publish.py:diff_state_tables``). Consumers get exactly the frame a
downstream system needs to catch up: new images on I/U, the final image
on D, optional ``old_<col>`` pre-images on U/D for delta-propagating
sinks (the aggregate-view algebra of ``cdc/views.py``, retraction-based
engines, audit trails).

Reference parity: ARLAS-proc can only hand a consumer the FULL output
of a run (readFromParquet → transform → writeToElasticsearch, e.g.
sql/WritableDataFrame.scala); a between-epochs change feed is the
CDC-native replacement for "re-read and re-ship everything".

Scale shape:

- **No shuffle, no driver state.** The feed is a Dataset built from the
  partition id list; each block is produced by one task reading two
  immutable parquet files. Downstream stages stream with backpressure —
  the whole feed is never resident.
- **Manifest pruning.** Partitions whose resolved source epoch is the
  same in both states are dropped at PLAN time (same immutable file ⇒
  zero changes) — a sparse delta epoch over a 100 TB table feeds only
  the partitions it touched.
- **Column pruning.** ``columns=`` narrows both reads to keys +
  requested columns before the diff kernel runs.
- **Fan-out changes** (``repartition_snapshot``) break per-partition
  alignment: the feed falls back to ONE co-partitioned global diff
  (``cdc/diff.py:snapshot_diff``) — correct, one exchange, but no
  pre-images (pass ``include_old=()`` or realign first).
"""

from __future__ import annotations

import os
from typing import Sequence

import pandas as pd
import pyarrow as pa

from arlas_proc_ray.cdc.publish import diff_state_tables
from arlas_proc_ray.cdc.snapshot import SnapshotStore


def change_feed(
    store: SnapshotStore,
    *,
    base: int | str,
    target: int | str | None = None,
    key_cols: Sequence[str] = ("repo", "path"),
    compare_cols: Sequence[str] | None = None,
    columns: Sequence[str] | None = None,
    include_old: Sequence[str] = (),
    op_col: str = "op",
    num_cpus: float = 0.5,
):
    """Dataset of I/U/D rows between ``base`` and ``target`` epochs.

    I/U rows carry the NEW image, D rows the last (old) image —
    ``snapshot_diff``'s contract. ``include_old`` adds ``old_<col>``
    pre-image columns (NULL on I rows). ``compare_cols`` bounds the
    change test (default: every non-key column of the read set); a row
    whose compare columns are all unchanged emits nothing. Epochs may be
    ints or named refs.
    """
    import ray.data as rd

    b = store._resolve_epoch_arg(base)
    t = store._resolve_epoch_arg(target)
    if b is None or t is None:
        raise RuntimeError("change_feed: both epochs must be committed")
    b_sum, t_sum = store.read_epoch_summary(b), store.read_epoch_summary(t)
    key_cols = list(key_cols)
    include_old = list(include_old)

    if b_sum["num_partitions"] != t_sum["num_partitions"]:
        if include_old:
            raise ValueError(
                "change_feed: fan-out changed between epochs; pre-images "
                "need per-partition alignment — re-align (refresh past the "
                "repartition) or drop include_old"
            )
        return _global_feed(
            store, b, t, key_cols, compare_cols, columns, op_col
        )

    num_partitions = t_sum["num_partitions"]
    b_src, t_src = store.resolve_sources(b), store.resolve_sources(t)
    todo = [
        p
        for p in range(num_partitions)
        if b_src.get(p) != t_src.get(p)  # same immutable file ⇒ no changes
    ]

    read_cols = None
    if columns is not None:
        read_cols = sorted(set(key_cols) | set(columns) | set(include_old))
        if compare_cols is not None:
            read_cols = sorted(set(read_cols) | set(compare_cols))

    def _select(tbl, cols):
        if tbl is None or cols is None:
            return tbl
        return tbl.select([c for c in cols if c in tbl.column_names])

    empty_tmpl = _empty_feed_frame(
        store, t, t_src, num_partitions, read_cols, include_old, op_col
    )

    def diff_parts(batch: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for p in batch["part"].tolist():
            old = _select(store.read_partition(b_src.get(p, b), p), read_cols)
            new = _select(store.read_partition(t_src.get(p, t), p), read_cols)
            if include_old:
                d, imgs = diff_state_tables(
                    old, new, key_cols=key_cols, compare_cols=compare_cols,
                    op_col=op_col, old_image_cols=include_old,
                )
                for c in include_old:
                    # both frames carry a fresh RangeIndex — positional
                    d[f"old_{c}"] = imgs[c]
            else:
                d = diff_state_tables(
                    old, new, key_cols=key_cols, compare_cols=compare_cols,
                    op_col=op_col,
                )
            if len(d):
                frames.append(d)
        if not frames:
            # Arrow typed empty: stable schema downstream, and Ray's
            # pandas block sizing can't handle zero-length object columns
            return empty_tmpl
        return pd.concat(frames, ignore_index=True)

    parts = rd.from_items([{"part": p} for p in todo])
    return parts.map_batches(
        diff_parts, batch_format="pandas", batch_size=1, num_cpus=num_cpus
    )


def _empty_feed_frame(
    store: SnapshotStore,
    t: int,
    t_src: dict,
    num_partitions: int,
    read_cols,
    include_old: list[str],
    op_col: str,
):
    """Zero-row Arrow table with the feed's exact column set and types."""
    import pyarrow.parquet as pq

    schema = None
    for p in range(num_partitions):
        path = store.part_data_path(t_src.get(p, t), p)
        if os.path.exists(path):
            schema = pq.read_schema(path)
            break
    if schema is None:
        return pa.table({op_col: pa.array([], pa.string())})
    fields = [
        f for f in schema
        if read_cols is None or f.name in read_cols
    ]
    cols = {f.name: pa.array([], f.type) for f in fields}
    cols[op_col] = pa.array([], pa.string())
    by_name = {f.name: f.type for f in fields}
    for c in include_old:
        cols[f"old_{c}"] = pa.array([], by_name.get(c, pa.string()))
    return pa.table(cols)


def _global_feed(
    store: SnapshotStore,
    b: int,
    t: int,
    key_cols: list[str],
    compare_cols,
    columns,
    op_col: str,
):
    """Fan-out-mismatch fallback: one co-partitioned global diff."""
    import ray.data as rd

    from arlas_proc_ray.cdc.diff import snapshot_diff
    from arlas_proc_ray.cdc.publish import _state_columns

    def state_ds(e: int):
        srcs = store.resolve_sources(e)
        n = store.read_epoch_summary(e)["num_partitions"]
        files = [
            store.part_data_path(srcs.get(p, e), p)
            for p in range(n)
            if os.path.exists(store.part_data_path(srcs.get(p, e), p))
        ]
        cols = None
        if columns is not None:
            cols = sorted(
                set(key_cols) | set(columns)
                | set(compare_cols if compare_cols is not None else ())
            )
        return rd.read_parquet(files, columns=cols)

    compare = list(
        compare_cols
        if compare_cols is not None
        else [
            c
            for c in (columns or _state_columns(store, t))
            if c not in key_cols
        ]
    )
    return snapshot_diff(
        state_ds(b),
        state_ds(t),
        key=key_cols,
        compare=compare,
        op_col=op_col,
        num_partitions=max(store.read_epoch_summary(t)["num_partitions"], 8),
    )
