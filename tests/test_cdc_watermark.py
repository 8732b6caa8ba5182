"""Regression: the exactly-once fence must be the APPLIED watermark.

Bug (round-1 ADVICE, high): the per-partition manifest's ``last_lsn`` was
the max over SURVIVING rows. A DELETE holding the partition's top LSN
lowered the fence, so at-least-once redelivery of an already-applied older
upsert passed the ``lsn > prior_last`` filter and resurrected the deleted
key. The fence is now ``max(prior watermark, max event lsn applied this
epoch)`` computed BEFORE tombstone drop, on all three engines (batch
groupby, staged raw-task shuffle, streaming actors) and on carry-forward.
"""

import pyarrow as pa
import pytest
import ray
import ray.data as rd

from arlas_proc_ray.cdc import CdcEngine
from arlas_proc_ray.cdc.actors import MergeActor, StreamingCdcEngine
from arlas_proc_ray.cdc.events import CANONICAL_EVENT_SCHEMA
from arlas_proc_ray.model import DataModel


def events(rows):
    """rows: list of (lsn, op, repo, path, content)."""
    return pa.Table.from_pylist(
        [
            {
                "lsn": lsn,
                "op": op,
                "repo": repo,
                "path": path,
                "commit": f"c{lsn}",
                "language": "py",
                "content": content,
                "content_size": len(content),
                "schema_version": 2,
                "delivery_index": lsn,
            }
            for (lsn, op, repo, path, content) in rows
        ],
        schema=CANONICAL_EVENT_SCHEMA,
    )


E1 = [(5, "INSERT", "o/keeper", "k.py", "keep me"),
      (9, "INSERT", "o/victim", "v.py", "resurrect bait")]
E2 = [(12, "DELETE", "o/victim", "v.py", "")]
# at-least-once redelivery of the ALREADY-APPLIED lsn-9 upsert
E3_REDELIVERED = [E1[1]]


def _keys(state: pa.Table) -> set:
    return set(state.column("repo").to_pylist())


def _assert_no_resurrection(final: pa.Table):
    assert _keys(final) == {"o/keeper"}, (
        "deleted key resurrected by redelivered pre-delete upsert"
    )


@pytest.mark.parametrize("parts", [1, 2])
def test_batch_engine_delete_holds_fence(tmp_path, parts):
    dm = DataModel(num_partitions=parts)
    eng = CdcEngine(str(tmp_path / "s"), dm)
    eng.apply_epoch(rd.from_arrow(events(E1)), 1)
    eng.apply_epoch(rd.from_arrow(events(E2)), 2)
    # the fence must record the DELETE's lsn even though it survives no row
    assert eng.store.read_epoch_summary(2)["last_lsn"] == 12
    eng.apply_epoch(rd.from_arrow(events(E3_REDELIVERED)), 3)
    _assert_no_resurrection(eng.final_state())
    # and the watermark still fences after an epoch that touched nothing
    eng.apply_epoch(rd.from_arrow(events([])), 4)
    eng.apply_epoch(rd.from_arrow(events(E3_REDELIVERED)), 5)
    _assert_no_resurrection(eng.final_state())


@pytest.mark.parametrize("parts", [1, 2])
def test_staged_engine_delete_holds_fence(tmp_path, parts):
    # parts=1 also regression-tests the num_returns=1 bare-ObjectRef path
    dm = DataModel(num_partitions=parts)
    eng = CdcEngine(str(tmp_path / "s"), dm)
    eng.apply_epoch_staged(rd.from_arrow(events(E1)), 1)
    eng.apply_epoch_staged(rd.from_arrow(events(E2)), 2)
    assert eng.store.read_epoch_summary(2)["last_lsn"] == 12
    eng.apply_epoch_staged(rd.from_arrow(events(E3_REDELIVERED)), 3)
    _assert_no_resurrection(eng.final_state())


def test_streaming_engine_delete_holds_fence(tmp_path):
    dm = DataModel(num_partitions=2)
    eng = StreamingCdcEngine(str(tmp_path / "s"), dm)
    try:
        eng.apply_epoch(rd.from_arrow(events(E1)), 1)
        eng.apply_epoch(rd.from_arrow(events(E2)), 2)
        assert eng.store.read_epoch_summary(2)["last_lsn"] == 12
        eng.apply_epoch(rd.from_arrow(events(E3_REDELIVERED)), 3)
        _assert_no_resurrection(eng.final_state())
    finally:
        eng.shutdown()


def test_streaming_engine_reload_uses_watermark(tmp_path):
    """Fresh actor pool (crash-restart) reloads the watermark, not the
    surviving max, from the last committed manifest."""
    dm = DataModel(num_partitions=2)
    snap = str(tmp_path / "s")
    eng = StreamingCdcEngine(snap, dm)
    try:
        eng.apply_epoch(rd.from_arrow(events(E1)), 1)
        eng.apply_epoch(rd.from_arrow(events(E2)), 2)
    finally:
        eng.shutdown()
    eng2 = StreamingCdcEngine(snap, dm)
    try:
        eng2.apply_epoch(rd.from_arrow(events(E3_REDELIVERED)), 3)
        _assert_no_resurrection(eng2.final_state())
    finally:
        eng2.shutdown()


def test_delta_epoch_carry_preserves_watermark(tmp_path):
    """delta=True leaves untouched partitions where they are; their fence
    must still be the old watermark when later epochs rewrite them."""
    dm = DataModel(num_partitions=2)
    eng = CdcEngine(str(tmp_path / "s"), dm)
    eng.apply_epoch(rd.from_arrow(events(E1)), 1)
    eng.apply_epoch(rd.from_arrow(events(E2)), 2, delta=True)
    eng.apply_epoch(rd.from_arrow(events(E3_REDELIVERED)), 3, delta=True)
    _assert_no_resurrection(eng.final_state())


def test_merge_actor_buffer_is_bounded(tmp_path):
    """Ingesting many batches totaling >> compact_rows keeps the buffer at
    O(distinct keys) rows and produces the same final state."""
    dm = DataModel(num_partitions=1)
    actor = MergeActor.remote(0, str(tmp_path / "s"), dm, 500)
    lsn = 0
    for _ in range(40):  # 40 x 200 = 8000 events over 100 keys
        rows = [
            (lsn + i, "UPDATE", "o/r", f"f{(lsn + i) % 100}.py", f"v{lsn + i}")
            for i in range(200)
        ]
        ray.get(actor.ingest.remote(events(rows)))
        lsn += 200
    stats = ray.get(actor.buffer_stats.remote())
    assert stats["rows"] <= 500 + 200  # compacted: never grows past bound+batch
    assert stats["epoch_max_lsn"] == 7999
    ray.get(actor.commit_epoch.remote(1))
    from arlas_proc_ray.cdc.snapshot import SnapshotStore

    state = SnapshotStore(str(tmp_path / "s")).read_partition(1, 0)
    assert state.num_rows == 100  # one surviving row per key
    # every surviving row carries its key's max lsn
    assert set(state.column("last_lsn").to_pylist()) == set(range(7900, 8000))
    ray.kill(actor)


def test_streaming_route_tolerates_empty_blocks(tmp_path):
    """Empty blocks are legal in Ray Data (e.g. after a filter)."""
    dm = DataModel(num_partitions=2)
    eng = StreamingCdcEngine(str(tmp_path / "s"), dm)
    try:
        ds = rd.from_arrow(events(E1)).filter(lambda r: r["lsn"] != 5)
        summary = eng.apply_epoch(ds, 1)
        assert summary["routed_events"] == 1
        assert _keys(eng.final_state()) == {"o/victim"}
    finally:
        eng.shutdown()
