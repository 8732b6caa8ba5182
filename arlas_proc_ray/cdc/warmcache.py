"""Warm partition-state cache for the staged batch engine (design doc +
implementation; VERDICT round-3 item 5 / SURVEY §7.4 actor-affinity note).

Problem: the batch engine keeps ALL state on disk (merge-on-read) — every
epoch's merge step re-reads each touched partition's prior state from
parquet. That is the property that makes crash-resume trivial, but on a
real multi-node cluster it re-ships a full snapshot read per epoch even
when the same worker just wrote that partition seconds ago.

Design: a pool of G long-lived **cache actors**, each OWNING a fixed
partition subset (``part % G == g`` — the same deterministic ownership a
placement-group pin would use on a real cluster, so partition→node
stickiness is the deploy-time knob, not a code change). Each actor keeps
``{partition: (epoch, state_table, last_lsn)}`` in its heap. The staged
exchange is unchanged (split tasks, LSN fences, manifests, commit
markers); only the MERGE step becomes an actor method:

* cache hit — the cached entry's epoch equals the epoch the commit
  chain RESOLVES the partition's prior state to (``prev_sources``): the
  parquet read is skipped entirely;
* cache miss — fall back to the store read (merge-on-read), exactly the
  cold path. A mismatch can only make it SLOWER, never wrong: the cache
  key is the resolved source epoch, so rollbacks, discarded WAP stages,
  delta chains and out-of-band writers all miss and re-read.

Crash story: an actor death loses only cached bytes — the store is the
source of truth and the normal resume fences re-run the partition. The
write path is byte-identical to cdc/staged.py's merge (shared helpers),
so the engine's equivalence property test extends to this path
(tests/test_chaos_engine.py::test_all_apply_paths_identical).

Memory: each actor holds its partitions' live state (≈ table_bytes / G
per actor). ``max_cached_bytes`` evicts largest-first beyond the budget
— eviction is also only a perf event.

Enable with ``CdcEngine(..., warm_cache=True)`` (or per call:
``apply_epoch_staged(..., warm_cache=True)``). Measured epoch-over-epoch
effect in BASELINE.md round-4 addendum.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray

from arlas_proc_ray.cdc.events import FINAL_STATE_SCHEMA
from arlas_proc_ray.cdc.replay import finalize_partition_table
from arlas_proc_ray.model import DataModel


@ray.remote(num_cpus=0.5)
class PartitionCacheActor:
    """Owns ``parts`` of the snapshot; caches their latest written state."""

    def __init__(
        self,
        snapshot_dir: str,
        dm: DataModel,
        fault_hook=None,
        max_cached_bytes: int = 2 * 1024**3,
    ):
        from arlas_proc_ray.cdc.snapshot import SnapshotStore

        self.dm = dm
        self.store = SnapshotStore(snapshot_dir, bloom_cols=dm.key_list)
        self.fault_hook = fault_hook
        self.max_cached_bytes = max_cached_bytes
        # partition -> (epoch_written, state_table, last_lsn)
        self.cache: dict[int, tuple[int, pa.Table, int]] = {}
        self.hits = 0
        self.misses = 0

    def _evict(self):
        total = sum(t.nbytes for _, t, _ in self.cache.values())
        while total > self.max_cached_bytes and self.cache:
            # evict the largest entry first (frees the most per eviction)
            p = max(self.cache, key=lambda k: self.cache[k][1].nbytes)
            total -= self.cache[p][1].nbytes
            del self.cache[p]

    def merge(
        self, epoch: int, part: int, src_epoch, delta: bool,
        *slices: pa.Table
    ):
        """Same merge/fence/finalize/write as cdc/staged.py's merge task,
        with the prior-state read served from cache when the cached entry
        matches the RESOLVED source epoch."""
        from arlas_proc_ray.cdc.engine import (
            _events_as_merge_rows,
            _state_as_merge_rows,
        )

        store = self.store
        if store.partition_done(epoch, part):  # crash-resume fence
            return store.read_manifest(epoch, part)
        prior = None
        prior_last = -1
        if src_epoch is not None:
            cached = self.cache.get(part)
            if cached is not None and cached[0] == src_epoch:
                _, prior, prior_last = cached
                self.hits += 1
            else:
                prior = store.read_partition(src_epoch, part)
                m = store.read_manifest(src_epoch, part)
                prior_last = m.last_lsn if m else -1
                self.misses += 1
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
                ev = ev.filter(
                    pc.greater(ev.column("lsn"), pa.scalar(prior_last))
                )
            inputs.append(_events_as_merge_rows(ev))
        if delta and src_epoch is not None and (
            ev is None or ev.num_rows == 0
        ):
            # untouched: reference the prior epoch's file; the cache
            # entry stays keyed to that epoch, which is exactly what the
            # next epoch's resolved source will ask for
            return int(src_epoch)
        if prior is not None and prior.num_rows:
            inputs.append(_state_as_merge_rows(prior))
        final = (
            finalize_partition_table(
                pa.concat_tables(inputs, promote_options="default"), self.dm
            )
            if inputs
            else FINAL_STATE_SCHEMA.empty_table()
        )
        if self.fault_hook is not None:
            self.fault_hook(epoch, part)
        m = store.write_partition(
            epoch, part, final, last_lsn=watermark,
            metrics={
                "events_applied": int(ev.num_rows) if ev is not None else 0,
                "warm_cache": True,
            },
        )
        self.cache[part] = (epoch, final, m.last_lsn)
        self._evict()
        return m

    def stats(self) -> dict:
        return {
            "hits": self.hits,
            "misses": self.misses,
            "cached_parts": sorted(self.cache),
            "cached_bytes": sum(t.nbytes for _, t, _ in self.cache.values()),
        }

    def invalidate(self):
        self.cache.clear()


def staged_apply_epoch_warm(
    engine, events_ds, epoch: int, *, pool,
    dead_letter_dir: str | None = None, publish: bool = True,
    delta: bool = False,
) -> dict:
    """One-level staged exchange with warm-cache actor merges. Identical
    guarantees to ``staged_apply_epoch`` (fences, manifests, commit
    marker); ``pool`` is the engine's ``PartitionCacheActor`` list —
    partition p is merged by ``pool[p % len(pool)]`` every epoch (the
    stickiness that makes the cache hit)."""
    from arlas_proc_ray.cdc.engine import check_committed_fanout
    from arlas_proc_ray.cdc.staged import _split_block

    dm = engine.dm
    store = engine.store
    prev_epoch = store.latest_committed_epoch()
    if prev_epoch is not None and prev_epoch >= epoch:
        raise ValueError(f"epoch {epoch} already committed (latest {prev_epoch})")
    check_committed_fanout(store, dm, prev_epoch)
    prev_sources = store.resolve_sources(prev_epoch) if prev_epoch is not None else {}

    align = engine._ingest_fn(epoch, dead_letter_dir)
    P = dm.num_partitions

    @ray.remote(num_returns=P)
    def split(block: pa.Table):
        parts = _split_block(block, dm, align)
        return tuple(parts) if P > 1 else parts[0]

    block_refs = events_ds.to_arrow_refs()
    split_out = [split.remote(ref) for ref in block_refs]
    G = len(pool)
    merge_refs = []
    for p in range(P):
        src = prev_sources.get(p, prev_epoch) if prev_epoch is not None else None
        merge_refs.append(
            pool[p % G].merge.remote(
                epoch, p, src, delta,
                *[
                    (split_out[b] if P == 1 else split_out[b][p])
                    for b in range(len(split_out))
                ],
            )
        )
    results = ray.get(merge_refs)
    sources = {
        p: r for p, r in enumerate(results) if isinstance(r, int)
    } or None
    if not publish:
        return engine._stage_epoch(epoch, sources, prev_epoch)
    return store.commit_epoch(
        epoch, P, sources=sources, expected_prev=prev_epoch
    )
