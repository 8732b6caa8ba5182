"""Incrementally-maintained materialized JOIN view between two stores.

``refresh_join_view`` keeps the classic hard case of incremental view
maintenance — ``A LEFT JOIN B ON A.fk = B.key`` between a fact store A
and a dimension store B — materialized as kit-managed partitioned rows
(one row per live A key, hash-partitioned by that key), refreshed by
delta propagation from BOTH stores' change data feeds instead of
re-joining the tables:

- **ΔA** (fact changed): I/U rows look up B's CURRENT image for the new
  foreign key (engine point lookups with partition pruning — never a
  B scan) and upsert the recomputed view row; D rows retract it.
- **ΔB** (dimension changed): the fact rows referencing a changed
  dimension key are found through the incrementally-maintained
  secondary index on ``A.fk`` (``cdc/secondary.py`` — never an A scan),
  re-read via A point lookups, and their view rows recomputed against
  B's new image. A dimension DELETE degrades those rows to left-join
  NULLs; a later re-insert restores them.

Bootstrap is the batch equivalent: one pass over A's state with B's
(dimension-sized) key→attributes map broadcast — the standard broadcast
join. The view checkpoint records BOTH epochs ``(A, B)``; refreshing
with a txn cut's per-table epochs (``cdc/txn.py``) yields a
multi-table-consistent view. The fk-side secondary index is refreshed
as part of every view refresh, so it can never lag the view.

Contract / bounds (documented, not hidden):

- B's join key must be B's PRIMARY key (single column) — the point-
  lookup pruning and one-row-per-key upsert semantics depend on it.
- Per refresh, driver-held state is bounded by the epoch's change
  volume: distinct new fks from ΔA, and changed-B-keys × fan-in from
  ΔB (a hot dimension key's write amplification is intrinsic to any
  materialized join). The corpus itself never moves.
- All columns materialize as strings (the store payload type); NULL
  b-columns mean "no matching dimension row" (left join).

Reference parity: ARLAS-proc joins are batch broadcast lookups
(WithCountryNameFormatted etc., re-run per pipeline); this is the
incremental-maintenance counterpart. Crash-safety, byte-exact identity,
spec-drift/fan-out rebuild, vacuum: inherited from ``cdc/index_base``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from arlas_proc_ray.cdc.index_base import (
    IncrementalPartitionedIndex,
    state_dataset,
)
from arlas_proc_ray.cdc.publish import split_doc_id, stable_doc_ids
from arlas_proc_ray.cdc.secondary import lookup_keys, refresh_secondary_index


def _fk_index_id(view_id: str) -> str:
    return f"joinview-{view_id}-fk"


def _enc(s: pd.Series) -> pd.Series:
    """UTF-8-encoded merge key (object-string merges collapse NULs)."""
    return s.astype(object).map(
        lambda v: v.encode("utf-8") if isinstance(v, str) else None
    )


class _JoinView(IncrementalPartitionedIndex):
    kind = "joinview"
    identity_cols = ["key"]
    keep = "last"  # an upsert replaces the previous image of the A key

    def __init__(self, engine_a, engine_b, view_id: str, spec: dict):
        super().__init__(engine_a.store, view_id, spec,
                         spec["num_partitions"])
        self.engine_a = engine_a
        self.engine_b = engine_b
        self.b_target: int | None = None   # resolved by refresh_join_view
        self.prev_b_epoch: int | None = None
        # Fused-refresh inputs (set by refresh_join_view): one shared A
        # state read / A feed frame serves both this kit and the fk
        # secondary index. fk_lookup_epoch pins the ΔB→affected-A
        # translation to the index's PRE-refresh epoch — sound because
        # every A key whose fk changed between base and target is in the
        # A feed and already excluded from affected_a (see feed_deltas).
        self.shared_state = None
        self.shared_feed: pd.DataFrame | None = None
        self.fk_lookup_epoch: int | None = None
        cols = [("key", pa.string()), (spec["fk_col"], pa.string())]
        cols += [(c, pa.string()) for c in spec["a_cols"]]
        cols += [(f"b_{c}", pa.string()) for c in spec["b_cols"]]
        self.schema = pa.schema(cols)  # instance schema (column-dependent)

    # ----------------------------------------------------------- epochs
    def on_loaded_checkpoint(self, ckpt: dict) -> None:
        self.prev_b_epoch = ckpt.get("b_epoch")

    def is_noop(self, base: int, target: int, ckpt: dict) -> bool:
        return base == target and ckpt.get("b_epoch") == self.b_target

    def extra_checkpoint(self) -> dict:
        return {"b_epoch": self.b_target}

    # ---------------------------------------------------------- helpers
    def _b_frame(self, b_rows: pd.DataFrame) -> pd.DataFrame:
        """(fk-encoded, b_* attribute) frame from B-state rows."""
        spec = self.spec
        b_key = spec["b_key_col"]
        out = pd.DataFrame({"_fk_enc": _enc(b_rows[b_key].astype(str))})
        for c in spec["b_cols"]:
            out[f"b_{c}"] = b_rows[c].astype(object)
        return out.drop_duplicates("_fk_enc")

    def _view_rows(self, a_rows: pd.DataFrame, b_frame: pd.DataFrame,
                   sign: int = 1) -> pd.DataFrame:
        """A-side rows (key,fk,a_cols) LEFT-merged against the B frame."""
        spec = self.spec
        out = pd.DataFrame(
            {
                "key": stable_doc_ids(
                    a_rows, spec["a_key_cols"]
                ).to_numpy(object),
                spec["fk_col"]: a_rows[spec["fk_col"]].astype(object)
                .to_numpy(object),
            }
        )
        for c in spec["a_cols"]:
            out[c] = a_rows[c].astype(object).to_numpy(object)
        out["_fk_enc"] = _enc(out[spec["fk_col"]])
        out = out.merge(b_frame, on="_fk_enc", how="left").drop(
            columns=["_fk_enc"]
        )
        for c in spec["b_cols"]:  # typed None, not NaN, in string columns
            col = f"b_{c}"
            out[col] = out[col].where(out[col].notna(), None)
        out["delta"] = np.int8(sign)
        return out

    def _removal_rows(self, keys) -> pd.DataFrame:
        out = pd.DataFrame({"key": pd.Series(keys, dtype=object)})
        for f in self.schema:
            if f.name != "key":
                out[f.name] = None
        out["delta"] = np.int8(-1)
        return out

    # ----------------------------------------------------------- deltas
    def bootstrap_deltas(self, target: int):
        import ray

        spec = self.spec
        a_cols_read = list(spec["a_key_cols"]) + [spec["fk_col"]] \
            + list(spec["a_cols"])
        b_cols_read = [spec["b_key_col"]] + list(spec["b_cols"])
        empty = self.empty_rows_arrow(delta=True)

        # broadcast the dimension's key→attribute map, built INSIDE a
        # task from B's state blocks (standard broadcast-join bound: the
        # DIMENSION table fits in memory, never the fact table)
        @ray.remote
        def _build_b(*tables: pa.Table) -> pd.DataFrame:
            frames = [t.to_pandas() for t in tables if t.num_rows]
            if not frames:
                return self._b_frame(
                    pd.DataFrame({c: pd.Series([], dtype=object)
                                  for c in b_cols_read})
                )
            return self._b_frame(pd.concat(frames, ignore_index=True))

        b_state = state_dataset(
            self.engine_b.store, self.b_target, b_cols_read
        )
        b_ref = _build_b.remote(*b_state.to_arrow_refs())

        def to_rows(pdf: pd.DataFrame):
            if not len(pdf):
                return empty
            return self._view_rows(pdf, ray.get(b_ref), 1)

        src = (
            self.shared_state
            if self.shared_state is not None
            else state_dataset(self.engine_a.store, target, a_cols_read)
        )
        return src.map_batches(
            to_rows, batch_format="pandas", batch_size=None
        )

    def feed_deltas(self, base: int, target: int):
        import ray
        import ray.data as rd

        from arlas_proc_ray.cdc.feed import change_feed

        spec = self.spec
        fk_col = spec["fk_col"]
        a_key_cols = list(spec["a_key_cols"])
        a_cols = list(spec["a_cols"])
        b_key_col = spec["b_key_col"]
        b_cols = list(spec["b_cols"])
        empty = self.empty_rows_arrow(delta=True)
        pieces = []

        # ---- ΔA: fact-side changes --------------------------------------
        a_feed = (
            self.shared_feed  # bounded ∝ the epoch's changed fact rows
            if self.shared_feed is not None
            else change_feed(
                self.engine_a.store, base=base, target=target,
                columns=[fk_col] + a_cols, compare_cols=[fk_col] + a_cols,
            ).to_pandas()
        )
        upserts = (
            a_feed[a_feed["op"].isin(["I", "U"])]
            if len(a_feed) else a_feed
        )
        a_dels = a_feed[a_feed["op"] == "D"] if len(a_feed) else a_feed

        # ---- ΔB: dimension-side changes ---------------------------------
        b_feed = change_feed(
            self.engine_b.store, base=self.prev_b_epoch,
            target=self.b_target, columns=b_cols, compare_cols=b_cols,
        ).to_pandas() if self.prev_b_epoch != self.b_target else \
            pd.DataFrame()
        changed_b_keys: list[str] = []
        if len(b_feed):
            changed_b_keys = sorted(
                set(
                    stable_doc_ids(b_feed, [b_key_col])
                )
            )
        affected_a: list[str] = []
        if changed_b_keys:
            # fact rows referencing the changed dimension keys, via the
            # fk secondary index (refreshed to `target` by the wrapper)
            hit = lookup_keys(
                self.engine_a.store, changed_b_keys,
                index_id=_fk_index_id(self.index_id),
                expect_epoch=(
                    target if self.fk_lookup_epoch is None
                    else self.fk_lookup_epoch
                ),
            )
            upsert_keys = (
                set(stable_doc_ids(upserts, a_key_cols)) if len(upserts)
                else set()
            )
            del_keys = (
                set(stable_doc_ids(a_dels, a_key_cols)) if len(a_dels)
                else set()
            )
            # rows already recomputed by ΔA (or deleted) need no re-read
            affected_a = sorted(
                set(hit["key"]) - upsert_keys - del_keys
            )
        if affected_a:
            a_rows = self.engine_a.lookup(
                [split_doc_id(k) for k in affected_a], epoch=target
            ).to_pandas()
        else:
            a_rows = pd.DataFrame()

        # ---- one pruned B read for every fk both pieces need ------------
        need_fks: set[str] = set()
        for frame in (upserts, a_rows):
            if len(frame):
                s = frame[fk_col]
                need_fks.update(str(v) for v in s[s.notna()])
        if need_fks:
            b_now = self.engine_b.lookup(
                [(v,) for v in sorted(need_fks)], epoch=self.b_target
            ).to_pandas()
        else:
            b_now = pd.DataFrame(
                {c: pd.Series([], dtype=object)
                 for c in [b_key_col] + b_cols}
            )
        b_frame = self._b_frame(b_now)

        if len(upserts):
            pieces.append(self._view_rows(upserts, b_frame, 1))
        if len(a_rows):
            pieces.append(self._view_rows(a_rows, b_frame, 1))
        if len(a_dels):
            pieces.append(
                self._removal_rows(
                    stable_doc_ids(a_dels, a_key_cols).to_numpy(object)
                )
            )

        if not pieces:
            return rd.from_arrow(empty)
        out = pd.concat(pieces, ignore_index=True)
        return rd.from_arrow(
            pa.Table.from_pandas(out, preserve_index=False).cast(
                pa.schema(list(self.schema) + [pa.field("delta", pa.int8())])
            )
        )

    def route(self, table: pa.Table) -> np.ndarray:
        from arlas_proc_ray.functions.hashing import partition_ids

        return partition_ids(table, ["key"], self.num_partitions)


def _spec(engine_a, engine_b, fk_col, a_cols, b_cols, b_key_col,
          num_partitions) -> dict:
    return {
        "fk_col": fk_col,
        "a_cols": list(a_cols),
        "b_cols": list(b_cols),
        "a_key_cols": list(engine_a.dm.key_cols),
        "b_key_col": b_key_col,
        "num_partitions": num_partitions,
    }


def refresh_join_view(
    engine_a,
    engine_b,
    *,
    view_id: str = "default",
    fk_col: str,
    a_cols,
    b_cols,
    epoch_a: int | str | None = None,
    epoch_b: int | str | None = None,
    num_partitions: int = 16,
    full: bool = False,
    commit_checkpoint: bool = True,
) -> dict:
    """Bring the materialized ``A LEFT JOIN B`` view up to the given
    epochs (default: each store's latest committed — pass a txn cut's
    epochs for multi-table consistency).

    ``fk_col`` is A's foreign-key payload column; it joins against B's
    single-column primary key. ``a_cols`` / ``b_cols`` are the payload
    columns materialized into the view (B's arrive prefixed ``b_``).
    """
    b_key_cols = list(engine_b.dm.key_cols)
    if len(b_key_cols) != 1:
        raise ValueError(
            "join view requires a single-column B primary key, got "
            f"{b_key_cols!r}"
        )
    spec = _spec(engine_a, engine_b, fk_col, a_cols, b_cols,
                 b_key_cols[0], num_partitions)
    kit = _JoinView(engine_a, engine_b, view_id, spec)
    kit.b_target = engine_b.store._resolve_epoch_arg(epoch_b)
    if kit.b_target is None:
        raise RuntimeError("store B has no committed epoch")
    # the fk secondary index backs the ΔB → affected-A-rows translation;
    # refreshing it here means it can never lag the view
    sec_spec = {
        "value_col": fk_col,
        "key_cols": list(engine_a.dm.key_cols),
        "num_partitions": num_partitions,
    }
    from arlas_proc_ray.cdc.index_base import fused_refresh
    from arlas_proc_ray.cdc.secondary import _SecondaryIndex

    sec_kit = _SecondaryIndex(
        engine_a.store, _fk_index_id(view_id), sec_spec, num_partitions
    )
    plan_s = sec_kit.plan(epoch=epoch_a, full=full)
    plan_v = kit.plan(epoch=epoch_a, full=full)

    if plan_v["noop"] is not None:
        # A epoch and B epoch both unchanged → the sec index is a noop
        # too (same store/epoch endpoints); nothing to do
        out = plan_v["noop"]
        out["b_epoch"] = kit.b_target
        return out

    fusable = (
        plan_s["noop"] is None
        and plan_s["target"] == plan_v["target"]
        and plan_s["base"] == plan_v["base"]
    )
    if not fusable:
        # mode/base mismatch (e.g. one checkpoint lost or the index is
        # already at target): today's sequential path — index first, so
        # the view's ΔB translation reads it AT target
        refresh_secondary_index(
            engine_a.store, index_id=_fk_index_id(view_id),
            value_col=fk_col, key_cols=engine_a.dm.key_cols,
            epoch=epoch_a, num_partitions=num_partitions, full=full,
        )
        out = kit.refresh(epoch=epoch_a, full=full,
                          commit_checkpoint=commit_checkpoint)
        out["b_epoch"] = kit.b_target
        return out

    # Fused path: ONE shared A-side input feeds both kits' deltas, and
    # both folds ride ONE routed exchange (index_base.fused_refresh) —
    # at scale this halves the A scans (bootstrap) / feed reads
    # (incremental) and the per-refresh exchange rounds.
    target, base = plan_v["target"], plan_v["base"]
    a_cols_read = (
        list(engine_a.dm.key_cols) + [fk_col] + list(a_cols)
    )
    if base is None:
        from arlas_proc_ray.cdc.index_base import state_dataset

        shared = state_dataset(
            engine_a.store, target, a_cols_read
        ).materialize()
        sec_kit.shared_state = shared
        kit.shared_state = shared
    else:
        from arlas_proc_ray.cdc.feed import change_feed

        shared = change_feed(
            engine_a.store, base=base, target=target,
            columns=[fk_col] + list(a_cols),
            compare_cols=[fk_col] + list(a_cols),
            include_old=[fk_col],
        ).to_pandas()
        sec_kit.shared_feed = shared
        kit.shared_feed = shared
        # ΔB→affected-A runs against the index AT base — sound because
        # every A key whose fk changed base→target is in the shared
        # feed and excluded from affected_a (upserts/deletes)
        kit.fk_lookup_epoch = base

    outs = fused_refresh(
        [(sec_kit, plan_s), (kit, plan_v)],
        commit_checkpoint=commit_checkpoint,
    )
    out = outs[1]
    out["b_epoch"] = kit.b_target
    return out


def _reader_kit(store, view_id: str) -> IncrementalPartitionedIndex:
    """Read-only kit instance reconstructed from the view's checkpoint."""
    kit = object.__new__(_JoinView)  # no engines needed for reads
    IncrementalPartitionedIndex.__init__(
        kit, store, view_id, {"num_partitions": 0}, 0
    )
    ckpt = kit.read_checkpoint()
    if ckpt is None:
        raise RuntimeError(f"view {view_id!r} has never been refreshed")
    spec = ckpt["spec"]
    cols = [("key", pa.string()), (spec["fk_col"], pa.string())]
    cols += [(c, pa.string()) for c in spec["a_cols"]]
    cols += [(f"b_{c}", pa.string()) for c in spec["b_cols"]]
    kit.schema = pa.schema(cols)
    kit.spec = spec
    kit.num_partitions = spec["num_partitions"]
    return kit


def read_join_checkpoint(store, view_id: str = "default") -> dict | None:
    kit = object.__new__(_JoinView)
    IncrementalPartitionedIndex.__init__(
        kit, store, view_id, {"num_partitions": 0}, 0
    )
    return kit.read_checkpoint()


def read_join_view(store, view_id: str = "default") -> pd.DataFrame:
    """The whole view as one frame (tests / small views only)."""
    return _reader_kit(store, view_id).read_all()


def join_view_dataset(store, view_id: str = "default"):
    """The view as a streaming Dataset (the big-read path)."""
    import os

    import ray.data as rd

    kit = _reader_kit(store, view_id)
    ckpt = kit.read_checkpoint()
    files = [
        kit.part_path(int(p), int(e))
        for p, e in sorted(ckpt["sources"].items(), key=lambda kv: int(kv[0]))
        if os.path.exists(kit.part_path(int(p), int(e)))
    ]
    return rd.read_parquet(files)
