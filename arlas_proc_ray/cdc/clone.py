"""Snapshot clone / fork: materialize a committed cut as a new store.

``clone_snapshot`` copies the RESOLVED partition files and manifests of
one committed epoch (or named ref) into a fresh store root, committed
there as epoch 0 with the source's fences intact. The clone is a fully
independent table:

- **backup**: vacuum/rollback/optimize on the source can never touch it;
- **fork / dev branch**: apply further epochs to the clone (the
  applied-LSN fences carried over mean a replay of the source's tail
  converges instead of double-applying);
- **fan-out change on the cheap**: clone then ``repartition_snapshot``
  without risking the production store.

Scale design: one Ray task per partition copies file + manifest
(byte-for-byte — content hashes and rollups carry over unchanged, so a
post-clone ``verify_deep`` certifies the copy); the driver touches only
manifests and the commit marker. Resumable: a crashed clone re-runs and
skips partitions whose destination fence is already written; the commit
marker lands last.

Reference parity note: ARLAS-proc has no snapshot management at all
(append-mode Parquet, ``sql/WritableDataFrame.scala:68-76``); cloning
belongs to the CDC reimagining's lakehouse layer.
"""

from __future__ import annotations

import dataclasses
import os
import shutil


def clone_snapshot(
    src_store,
    dest_root: str,
    *,
    epoch: int | str | None = None,
    dest_epoch: int = 0,
) -> dict:
    """Copy the resolved state of ``epoch`` (int, ref name, or None =
    latest) into a new store at ``dest_root``, committed as
    ``dest_epoch``. Returns ``{epoch, partitions, rows, bytes}``."""
    import ray

    from arlas_proc_ray.cdc.snapshot import SnapshotStore

    e = src_store._resolve_epoch_arg(epoch)
    if e is None:
        raise RuntimeError("source store has no committed epoch")
    sources = src_store.resolve_sources(e)
    num_parts = src_store.read_epoch_summary(e)["num_partitions"]

    dest = SnapshotStore(
        dest_root,
        bloom_cols=src_store.bloom_cols,
        cluster_by=src_store.cluster_by or None,
        cluster_zorder=src_store.cluster_zorder or None,
        row_group_rows=src_store.row_group_rows,
        compression=src_store.compression,
    )
    if dest.latest_committed_epoch() is not None:
        raise ValueError(f"destination {dest_root!r} already has commits")

    src_root = src_store.root

    @ray.remote(num_cpus=0.25)
    def copy_part(part: int) -> dict:
        # fresh store handles inside the task (no driver state shipped)
        s = SnapshotStore(src_root)
        d = SnapshotStore(dest_root)
        if d.partition_done(dest_epoch, part):  # crash-resume fence
            m = d.read_manifest(dest_epoch, part)
            return {"rows": m.row_count, "bytes": 0, "skipped": True}
        src_e = sources.get(part, e)
        m = s.read_manifest(src_e, part)
        data_src = s.part_data_path(src_e, part)
        out_dir = d.epoch_dir(dest_epoch)
        os.makedirs(out_dir, exist_ok=True)
        n_bytes = 0
        data_dst = d.part_data_path(dest_epoch, part)
        if os.path.exists(data_src):
            tmp = data_dst + ".tmp"
            shutil.copyfile(data_src, tmp)  # byte-for-byte: hashes carry
            os.replace(tmp, data_dst)
            n_bytes = os.path.getsize(data_dst)
        # manifest last (it IS the fence): epoch renumbered, rest intact
        import json

        cloned = dataclasses.replace(m, epoch=dest_epoch)
        payload = json.dumps(dataclasses.asdict(cloned))
        tmp = d.part_manifest_path(dest_epoch, part) + ".tmp"
        with open(tmp, "w") as f:
            f.write(payload)
        os.replace(tmp, d.part_manifest_path(dest_epoch, part))
        return {"rows": m.row_count, "bytes": n_bytes, "skipped": False}

    results = ray.get([copy_part.remote(p) for p in range(num_parts)])
    dest.commit_epoch(dest_epoch, num_parts)
    return {
        "epoch": dest_epoch,
        "source_epoch": e,
        "partitions": num_parts,
        "rows": sum(r["rows"] for r in results),
        "bytes": sum(r["bytes"] for r in results),
    }


def sync_snapshot(
    src_store,
    dest_root: str,
    *,
    epoch: int | str | None = None,
) -> dict:
    """Incremental clone: bring a destination store up to the source's
    committed cut, copying ONLY the partitions whose backing file moved
    since the last sync (backup / DR replication, cost ∝ change rate).

    First call bootstraps via ``clone_snapshot``; every later call
    commits one new destination epoch whose source map DELTA-REFERENCES
    the prior destination epoch for unchanged partitions (the same
    metadata-chain mechanism as ``apply_epoch(delta=True)``), so an
    idle source costs one manifest pass and zero data bytes. A source
    fan-out change forces a full re-copy into the new destination epoch
    (pre-images across a repartition are not comparable). The synced
    source epoch is recorded in ``<dest>/_SYNC`` — the destination
    remains a normal store (scan/verify/vacuum all work), and a crashed
    sync re-runs idempotently through the partition fences.
    """
    import json

    import ray

    from arlas_proc_ray.cdc.snapshot import (
        SnapshotStore,
        _atomic_write_bytes,
    )

    e = src_store._resolve_epoch_arg(epoch)
    if e is None:
        raise RuntimeError("source store has no committed epoch")
    sync_path = os.path.join(dest_root, "_SYNC")

    dest = SnapshotStore(dest_root)
    dest_tip = dest.latest_committed_epoch()
    if dest_tip is None:
        out = clone_snapshot(src_store, dest_root, epoch=e, dest_epoch=0)
        _atomic_write_bytes(
            sync_path, json.dumps({"src_epoch": int(e)}).encode()
        )
        return {**out, "mode": "bootstrap", "partitions_copied":
                out["partitions"]}

    if not os.path.exists(sync_path):
        raise RuntimeError(
            f"{dest_root!r} has commits but no _SYNC marker — not a sync "
            "destination (refusing to overwrite an unrelated store)"
        )
    with open(sync_path) as f:
        prev_src = int(json.load(f)["src_epoch"])
    if prev_src == e:
        return {"mode": "noop", "epoch": dest_tip, "source_epoch": e,
                "partitions_copied": 0}

    num_parts = src_store.read_epoch_summary(e)["num_partitions"]
    prev_parts = src_store.read_epoch_summary(prev_src)["num_partitions"]
    cur_sources = src_store.resolve_sources(e)
    full = num_parts != prev_parts
    if not full:
        prev_sources = src_store.resolve_sources(prev_src)
        changed = [
            p for p in range(num_parts)
            if cur_sources.get(p, e) != prev_sources.get(p, prev_src)
        ]
    else:
        changed = list(range(num_parts))
    dest_epoch = dest_tip + 1
    dest_prev_sources = dest.resolve_sources(dest_tip)
    src_root = src_store.root

    @ray.remote(num_cpus=0.25)
    def copy_part(part: int) -> dict:
        s = SnapshotStore(src_root)
        d = SnapshotStore(dest_root)
        if d.partition_done(dest_epoch, part):  # crash-resume fence
            m = d.read_manifest(dest_epoch, part)
            return {"rows": m.row_count, "bytes": 0}
        src_e = cur_sources.get(part, e)
        m = s.read_manifest(src_e, part)
        os.makedirs(d.epoch_dir(dest_epoch), exist_ok=True)
        n_bytes = 0
        data_src = s.part_data_path(src_e, part)
        data_dst = d.part_data_path(dest_epoch, part)
        if os.path.exists(data_src):
            tmp = data_dst + ".tmp"
            shutil.copyfile(data_src, tmp)
            os.replace(tmp, data_dst)
            n_bytes = os.path.getsize(data_dst)
        cloned = dataclasses.replace(m, epoch=dest_epoch)
        payload = json.dumps(dataclasses.asdict(cloned))
        tmp = d.part_manifest_path(dest_epoch, part) + ".tmp"
        with open(tmp, "w") as f:
            f.write(payload)
        os.replace(tmp, d.part_manifest_path(dest_epoch, part))
        return {"rows": m.row_count, "bytes": n_bytes}

    results = ray.get([copy_part.remote(p) for p in changed])
    sources = {
        p: dest_prev_sources.get(p, dest_tip)
        for p in range(num_parts)
        if p not in set(changed)
    } if not full else None
    dest.commit_epoch(
        dest_epoch, num_parts, sources=sources, expected_prev=dest_tip
    )
    _atomic_write_bytes(
        sync_path, json.dumps({"src_epoch": int(e)}).encode()
    )
    return {
        "mode": "full" if full else "incremental",
        "epoch": dest_epoch,
        "source_epoch": e,
        "partitions_copied": len(changed),
        "partitions_referenced": num_parts - len(changed),
        "bytes": sum(r["bytes"] for r in results),
    }
