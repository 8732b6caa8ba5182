"""Incrementally-maintained secondary index: payload value → primary keys.

``refresh_secondary_index`` keeps an inverted mapping — rows
``(val, key)`` hash-partitioned by the VALUE — from one payload column
of a snapshot store's state to the stable doc ids that currently carry
that value, maintained epoch-over-epoch from the change data feed
(``cdc/feed.py``) on the shared partitioned-index kit
(``cdc/index_base.py``):

- **I** rows add ``(new_val, key)``,
- **U** rows (value actually changed — the feed compares just this
  column) remove ``(old_val, key)`` and add ``(new_val, key)``,
- **D** rows remove ``(final_val, key)``.

``lookup_keys`` then answers reverse point queries — *which entities
currently have column C = v?* — by reading ONLY the partitions the
requested values hash into, the mirror image of the engine's
key-side ``lookup`` pruning. This is also the building block the
incrementally-maintained join view (``cdc/joinview.py``) uses to find
the fact rows affected by a dimension change without scanning the fact
table.

NULL / empty values are not indexed (SQL-index semantics: ``WHERE c =
v`` never matches NULL); a transition to NULL is a pure removal.

Scale shape: refresh ∝ changed rows; lookup ∝ probed partitions; all
crash-safety, byte-exactness and rebuild fallbacks inherited from the
kit.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

from arlas_proc_ray.cdc.index_base import (
    IncrementalPartitionedIndex,
    state_dataset,
)
from arlas_proc_ray.cdc.publish import stable_doc_ids
from arlas_proc_ray.cdc.snapshot import SnapshotStore


class _SecondaryIndex(IncrementalPartitionedIndex):
    kind = "secindex"
    schema = pa.schema([("val", pa.string()), ("key", pa.string())])
    identity_cols = ["val", "key"]
    keep = "first"

    # Optional shared inputs (set by a fused orchestrator, e.g.
    # cdc/joinview.refresh_join_view): a pre-materialized state Dataset
    # for bootstrap, a pre-collected change-feed frame for incremental.
    # The shared feed may compare a WIDER column set than this index's
    # value column — U rows whose indexed value didn't change are
    # filtered here so untouched partitions stay untouched.
    shared_state = None
    shared_feed: pd.DataFrame | None = None

    def _rows(self, values, keys, sign: int) -> pd.DataFrame | None:
        v = pd.Series(values).reset_index(drop=True)
        k = pd.Series(keys).reset_index(drop=True)
        live = v.notna() & (v != "")
        if not live.any():
            return None
        return pd.DataFrame(
            {
                "val": v[live].astype(object).to_numpy(object),
                "key": k[live].astype(object).to_numpy(object),
                "delta": np.full(int(live.sum()), sign, dtype=np.int8),
            }
        )

    def bootstrap_deltas(self, target: int):
        key_cols = list(self.spec["key_cols"])
        value_col = self.spec["value_col"]
        empty = self.empty_rows_arrow(delta=True)

        def to_rows(pdf: pd.DataFrame):
            out = self._rows(
                pdf[value_col], stable_doc_ids(pdf, key_cols), 1
            )
            return out if out is not None else empty

        src = (
            self.shared_state
            if self.shared_state is not None
            else state_dataset(self.store, target, key_cols + [value_col])
        )
        return src.map_batches(
            to_rows, batch_format="pandas", batch_size=None
        )

    def feed_deltas(self, base: int, target: int):
        from arlas_proc_ray.cdc.feed import change_feed

        key_cols = list(self.spec["key_cols"])
        value_col = self.spec["value_col"]
        empty = self.empty_rows_arrow(delta=True)

        if self.shared_feed is not None:
            import ray.data as rd

            pdf = self.shared_feed
            if len(pdf):
                ov, nv = pdf[f"old_{value_col}"], pdf[value_col]
                same = (pdf["op"].to_numpy() == "U") & (
                    (ov == nv) | (ov.isna() & nv.isna())
                ).to_numpy()
                pdf = pdf.loc[~same]
            rows = self._feed_rows(pdf, key_cols, value_col)
            if rows is None:
                return rd.from_arrow(empty)
            return rd.from_arrow(
                pa.Table.from_pandas(rows, preserve_index=False).cast(
                    pa.schema(
                        list(self.schema) + [pa.field("delta", pa.int8())]
                    )
                )
            )

        feed = change_feed(
            self.store, base=base, target=target,
            columns=[value_col], compare_cols=[value_col],
            include_old=[value_col],
        )

        def to_rows(pdf: pd.DataFrame):
            rows = self._feed_rows(pdf, key_cols, value_col)
            return rows if rows is not None else empty

        return feed.map_batches(to_rows, batch_format="pandas", batch_size=None)

    def _feed_rows(self, pdf: pd.DataFrame, key_cols,
                   value_col: str) -> pd.DataFrame | None:
        """±delta rows for one feed frame (None when nothing to emit)."""
        if not len(pdf):
            return None
        keys = stable_doc_ids(pdf, key_cols)
        ops = pdf["op"].to_numpy()
        frames = []
        add = (ops == "I") | (ops == "U")
        a = self._rows(pdf.loc[add, value_col], keys[add], 1)
        if a is not None:
            frames.append(a)
        u, d = ops == "U", ops == "D"
        old_vals = pd.concat(
            [pdf.loc[u, f"old_{value_col}"], pdf.loc[d, value_col]]
        )
        old_keys = pd.concat([keys[u], keys[d]])
        r = self._rows(old_vals, old_keys, -1)
        if r is not None:
            frames.append(r)
        if not frames:
            return None
        return pd.concat(frames, ignore_index=True)

    def route(self, table: pa.Table) -> np.ndarray:
        from arlas_proc_ray.functions.hashing import partition_ids

        return partition_ids(table, ["val"], self.num_partitions)


def _bare(store: SnapshotStore, index_id: str) -> _SecondaryIndex:
    return _SecondaryIndex(store, index_id, {"num_partitions": 0}, 0)


def read_secondary_checkpoint(store: SnapshotStore,
                              index_id: str) -> dict | None:
    return _bare(store, index_id).read_checkpoint()


def refresh_secondary_index(
    store: SnapshotStore,
    *,
    index_id: str = "default",
    value_col: str,
    key_cols: Sequence[str] = ("repo", "path"),
    epoch: int | str | None = None,
    num_partitions: int = 16,
    full: bool = False,
    commit_checkpoint: bool = True,
) -> dict:
    """Bring the value→key index up to ``epoch`` (default: latest)."""
    spec = {
        "value_col": value_col, "key_cols": list(key_cols),
        "num_partitions": num_partitions,
    }
    kit = _SecondaryIndex(store, index_id, spec, num_partitions)
    return kit.refresh(epoch=epoch, full=full,
                       commit_checkpoint=commit_checkpoint)


def read_secondary_index(store: SnapshotStore,
                         index_id: str = "default") -> pd.DataFrame:
    """The whole index as one frame (tests / small corpora only)."""
    kit = _bare(store, index_id)
    ckpt = kit.read_checkpoint()
    if ckpt is None:
        raise RuntimeError(f"index {index_id!r} has never been refreshed")
    kit.spec = ckpt["spec"]
    kit.num_partitions = ckpt["spec"]["num_partitions"]
    return kit.read_all()


def lookup_keys(
    store: SnapshotStore,
    values: Sequence[str],
    *,
    index_id: str = "default",
    expect_epoch: int | str | None = None,
) -> pd.DataFrame:
    """(val, key) rows for every requested value — reverse point lookup.

    Only the partitions the values hash into are read (≤ ``len(values)``
    of them), independent of index size. Byte-exact value match.
    ``expect_epoch`` guards against probing a stale index.
    """
    import os

    from arlas_proc_ray.functions.hashing import partition_ids

    kit = _bare(store, index_id)
    ckpt = kit.read_checkpoint()
    if ckpt is None:
        raise RuntimeError(f"index {index_id!r} has never been refreshed")
    if expect_epoch is not None:
        want = store._resolve_epoch_arg(expect_epoch)
        if ckpt["epoch"] != want:
            raise RuntimeError(
                f"index {index_id!r} is at epoch {ckpt['epoch']}, lookup "
                f"wants {want}: refresh_secondary_index first"
            )
    kit.spec = ckpt["spec"]
    kit.num_partitions = ckpt["spec"]["num_partitions"]
    vals = [v for v in dict.fromkeys(values) if v is not None and v != ""]
    if not vals:
        return pd.DataFrame({"val": pd.Series([], dtype=object),
                             "key": pd.Series([], dtype=object)})
    req = pa.table({"val": pa.array(vals, pa.string())})
    pids = partition_ids(req, ["val"], kit.num_partitions)
    want_b = {v.encode("utf-8") for v in vals}
    out = []
    sources = ckpt["sources"]
    for p in sorted(set(int(x) for x in pids)):
        src = sources.get(str(p))
        if src is None or not os.path.exists(kit.part_path(p, int(src))):
            continue
        pdf = kit.read_part(p, src)
        if not len(pdf):
            continue
        hit = pdf[pdf["val"].str.encode("utf-8").isin(want_b)]
        if len(hit):
            out.append(hit)
    if not out:
        return pd.DataFrame({"val": pd.Series([], dtype=object),
                             "key": pd.Series([], dtype=object)})
    return (
        pd.concat(out, ignore_index=True)
        .sort_values(["val", "key"], kind="mergesort")
        .reset_index(drop=True)
    )
