"""Staged shuffle for high-volume epochs — raw Ray tasks, no sort machinery.

At tens of millions of events per epoch, `groupby(_part_id).map_groups`
becomes the wall: Ray Data's sort-based exchange sorts and re-blocks the
full payload (and the hash-shuffle aggregator actors serialize on hot
aggregation paths) — measured ~56 MB/s end-to-end at 20M events where the
map phase alone runs at >1 GB/s. The fix is the classic two-phase external
shuffle expressed directly in Ray Core (the justified "raw tasks" escape
hatch: a fixed-fan-out exchange needs no ordering, no sampling, no
aggregation — exactly what the Dataset groupby cannot skip):

  phase 1  split:  one task per input block → P zero-copy slices by
                   ``_part_id`` (ONE argsort per block), returned as P
                   separate objects (``num_returns=P``) so each lands in
                   the object store individually addressable;
  phase 2  merge:  one task per partition gathers its B slices, runs the
                   SAME merge/fence/finalize/write as the engine's
                   map_groups path (cdc/engine.py), writes the fenced
                   snapshot + manifest.

Partition routing is the same stable hash; resume fences are the same
manifests — the two paths are interchangeable per epoch on one store.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from arlas_proc_ray.cdc.engine import (
    _events_as_merge_rows,
    _state_as_merge_rows,
    check_committed_fanout,
)
from arlas_proc_ray.cdc.events import FINAL_STATE_SCHEMA
from arlas_proc_ray.cdc.replay import (
    finalize_partition_table,
    lww_reduce_table,
)
from arlas_proc_ray.functions.hashing import partition_ids
from arlas_proc_ray.model import DataModel


def _split_block(table: pa.Table, dm: DataModel, align) -> list[pa.Table]:
    """normalize → combine → ONE argsort by partition → P zero-copy slices."""
    table = align(table)
    table = lww_reduce_table(table, dm.key_cols, dm.order_col)
    pids = partition_ids(table, dm.key_list, dm.num_partitions)
    order = np.argsort(pids, kind="stable")
    sorted_pids = pids[order]
    bounds = np.searchsorted(sorted_pids, np.arange(dm.num_partitions + 1))
    # per-partition take() — NOT slice(): a pyarrow slice pickles the whole
    # underlying buffer (P× blow-up through the object store); take copies
    # exactly the partition's rows
    return [
        table.take(pa.array(order[bounds[p] : bounds[p + 1]]))
        for p in range(dm.num_partitions)
    ]


def staged_apply_epoch(engine, events_ds, epoch: int, *,
                      dead_letter_dir: str | None = None,
                      publish: bool = True, delta: bool = False) -> dict:
    """Apply one epoch with the staged shuffle; same guarantees as
    ``CdcEngine.apply_epoch`` (idempotent, resumable, exactly-once).
    ``publish=False`` stages the cut for write-audit-publish exactly as
    the Dataset path does (engine._stage_epoch).

    ``delta=True``: a partition that received NO surviving events this
    epoch is not rewritten — the commit marker's source map references
    the epoch that last wrote it (the same metadata chain as the Dataset
    path's ``delta``). A re-delivered duplicate (every event ≤ the
    partition fence) also references: the state AND watermark are
    provably unchanged. At low change rates this removes the dominant
    copy-forward cost from the staged path too.
    """
    dm = engine.dm
    store = engine.store
    fault_hook = engine.fault_hook
    prev_epoch = store.latest_committed_epoch()
    if prev_epoch is not None and prev_epoch >= epoch:
        raise ValueError(f"epoch {epoch} already committed (latest {prev_epoch})")
    check_committed_fanout(store, dm, prev_epoch)
    prev_sources = store.resolve_sources(prev_epoch) if prev_epoch is not None else {}

    # shared ingest head: structural validity (DLQ) or alignment, then
    # table-constraint enforcement (engine._ingest_fn / cdc/constraints.py)
    align = engine._ingest_fn(epoch, dead_letter_dir)
    P = dm.num_partitions

    @ray.remote(num_returns=P)
    def split(block: pa.Table):
        parts = _split_block(block, dm, align)
        return tuple(parts) if P > 1 else parts[0]

    @ray.remote
    def merge(part: int, *slices: pa.Table):
        if store.partition_done(epoch, part):  # crash-resume fence
            m = store.read_manifest(epoch, part)
            return m
        prior = None
        prior_last = -1
        src = None
        if prev_epoch is not None:
            src = prev_sources.get(part, prev_epoch)
            prior = store.read_partition(src, part)
            pm = store.read_manifest(src, part)
            prior_last = pm.last_lsn if pm else -1
        ev = pa.concat_tables(
            [s for s in slices if s.num_rows], promote_options="default"
        ) if any(s.num_rows for s in slices) else None
        # applied watermark BEFORE tombstone drop / dedup filter
        watermark = max(
            prior_last,
            int(pc.max(ev.column("lsn")).as_py()) if ev is not None else -1,
        )
        inputs = []
        if ev is not None:
            if prior_last >= 0:
                ev = ev.filter(pc.greater(ev.column("lsn"), pa.scalar(prior_last)))
            inputs.append(_events_as_merge_rows(ev))
        if delta and src is not None and (
            ev is None or ev.num_rows == 0
        ):
            # untouched (or fully-fenced duplicate) partition: reference
            # the prior epoch's file instead of rewriting it
            return int(src)
        if prior is not None and prior.num_rows:
            inputs.append(_state_as_merge_rows(prior))
        final = (
            finalize_partition_table(
                pa.concat_tables(inputs, promote_options="default"), dm
            )
            if inputs
            else FINAL_STATE_SCHEMA.empty_table()
        )
        if fault_hook is not None:
            fault_hook(epoch, part)
        return store.write_partition(
            epoch, part, final, last_lsn=watermark,
            metrics={
                "events_applied": int(ev.num_rows) if ev is not None else 0
            },
        )

    # phase 1: one split task per input block (refs, never driver-local)
    block_refs = events_ds.to_arrow_refs()
    split_out = [split.remote(ref) for ref in block_refs]

    # phase 2: per-partition merges over the transposed ref matrix.
    # num_returns=1 hands back a bare ObjectRef (not a 1-list) — index
    # only when P > 1.
    merge_refs = [
        merge.remote(
            p,
            *[
                (split_out[b] if P == 1 else split_out[b][p])
                for b in range(len(split_out))
            ],
        )
        for p in range(P)
    ]
    results = ray.get(merge_refs)
    sources = {
        p: r for p, r in enumerate(results) if isinstance(r, int)
    } or None
    if not publish:
        return engine._stage_epoch(epoch, sources, prev_epoch)
    return store.commit_epoch(
        epoch, P, sources=sources, expected_prev=prev_epoch
    )


def staged_apply_epoch_two_level(
    engine, events_ds, epoch: int, *, groups: int | None = None,
    dead_letter_dir: str | None = None,
    publish: bool = True, delta: bool = False,
) -> dict:
    """Two-level staged exchange for LARGE partition fan-outs.

    The one-level exchange creates ``blocks × P`` objects; past ~10k
    objects the per-object overhead dominates (measured in round 1:
    400×128 spent 116 s in the split wave alone). Two levels cut that to
    ``blocks × G + P`` objects (G ≈ √P super-groups):

      level 1  split:    one task per block → G super-group slices
                         (partition_id // (P/G) buckets), num_returns=G;
      level 2  sub-split: one task per super-group gathers its B slices,
                         concats, ONE argsort → its P/G partition tables,
                         num_returns=P/G;
      level 3  merge:    the same per-partition fence/merge/finalize/write
                         as the one-level path.

    For P=512, B=400: one-level 204 800 objects; two-level 400×23 + 512 ≈
    9 700. Same guarantees (idempotent, resumable, exactly-once) — the
    merge phase is shared code.
    """
    import math

    dm = engine.dm
    store = engine.store
    fault_hook = engine.fault_hook
    prev_epoch = store.latest_committed_epoch()
    if prev_epoch is not None and prev_epoch >= epoch:
        raise ValueError(f"epoch {epoch} already committed (latest {prev_epoch})")
    check_committed_fanout(store, dm, prev_epoch)
    prev_sources = store.resolve_sources(prev_epoch) if prev_epoch is not None else {}

    # shared ingest head: structural validity (DLQ) or alignment, then
    # table-constraint enforcement (engine._ingest_fn / cdc/constraints.py)
    align = engine._ingest_fn(epoch, dead_letter_dir)
    P = dm.num_partitions
    G = groups or max(1, int(math.isqrt(P)))
    G = min(G, P)
    per_group = math.ceil(P / G)

    @ray.remote(num_returns=max(G, 1))
    def split_l1(block: pa.Table):
        table = align(block)
        table = lww_reduce_table(table, dm.key_cols, dm.order_col)
        pids = partition_ids(table, dm.key_list, dm.num_partitions)
        gids = pids // per_group
        order = np.argsort(gids, kind="stable")
        sorted_gids = gids[order]
        bounds = np.searchsorted(sorted_gids, np.arange(G + 1))
        # append _part_id so level 2 need not re-hash
        table = table.append_column("_pid", pa.array(pids, type=pa.int32()))
        parts = [
            table.take(pa.array(order[bounds[g] : bounds[g + 1]]))
            for g in range(G)
        ]
        return tuple(parts) if G > 1 else parts[0]

    @ray.remote(num_returns=max(per_group, 1))
    def split_l2(g: int, *slices: pa.Table):
        live = [s for s in slices if s.num_rows]
        if not live:
            empty = slices[0].slice(0, 0).drop_columns(["_pid"])
            out = [empty] * per_group
            return tuple(out) if per_group > 1 else out[0]
        t = pa.concat_tables(live, promote_options="default")
        pids = t.column("_pid").to_numpy()
        t = t.drop_columns(["_pid"])
        local = pids - g * per_group
        order = np.argsort(local, kind="stable")
        sorted_local = local[order]
        bounds = np.searchsorted(sorted_local, np.arange(per_group + 1))
        parts = [
            t.take(pa.array(order[bounds[i] : bounds[i + 1]]))
            for i in range(per_group)
        ]
        return tuple(parts) if per_group > 1 else parts[0]

    @ray.remote
    def merge(part: int, *slices: pa.Table):
        if store.partition_done(epoch, part):  # crash-resume fence
            return store.read_manifest(epoch, part)
        prior = None
        prior_last = -1
        src = None
        if prev_epoch is not None:
            src = prev_sources.get(part, prev_epoch)
            prior = store.read_partition(src, part)
            pm = store.read_manifest(src, part)
            prior_last = pm.last_lsn if pm else -1
        ev = (
            pa.concat_tables(
                [s for s in slices if s.num_rows], promote_options="default"
            )
            if any(s.num_rows for s in slices)
            else None
        )
        watermark = max(
            prior_last,
            int(pc.max(ev.column("lsn")).as_py()) if ev is not None else -1,
        )
        inputs = []
        if ev is not None:
            if prior_last >= 0:
                ev = ev.filter(pc.greater(ev.column("lsn"), pa.scalar(prior_last)))
            inputs.append(_events_as_merge_rows(ev))
        if delta and src is not None and (ev is None or ev.num_rows == 0):
            return int(src)  # untouched: reference, don't rewrite
        if prior is not None and prior.num_rows:
            inputs.append(_state_as_merge_rows(prior))
        final = (
            finalize_partition_table(
                pa.concat_tables(inputs, promote_options="default"), dm
            )
            if inputs
            else FINAL_STATE_SCHEMA.empty_table()
        )
        if fault_hook is not None:
            fault_hook(epoch, part)
        return store.write_partition(
            epoch, part, final, last_lsn=watermark,
            metrics={
                "events_applied": int(ev.num_rows) if ev is not None else 0
            },
        )

    block_refs = events_ds.to_arrow_refs()
    B = len(block_refs)
    l1 = [split_l1.remote(ref) for ref in block_refs]  # B × G objects

    def _l1(b, g):
        return l1[b] if G == 1 else l1[b][g]

    l2 = [
        split_l2.remote(g, *[_l1(b, g) for b in range(B)]) for g in range(G)
    ]  # G tasks → P objects

    def _l2(g, i):
        return l2[g] if per_group == 1 else l2[g][i]

    merge_refs = []
    for part in range(P):
        g, i = part // per_group, part % per_group
        merge_refs.append(merge.remote(part, _l2(g, i)))
    results = ray.get(merge_refs)
    sources = {
        p: r for p, r in enumerate(results) if isinstance(r, int)
    } or None
    if not publish:
        return engine._stage_epoch(epoch, sources, prev_epoch)
    return store.commit_epoch(
        epoch, P, sources=sources, expected_prev=prev_epoch
    )
