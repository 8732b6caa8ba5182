"""Distributed deep integrity verification of committed snapshots."""

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from arlas_proc_ray.cdc.engine import CdcEngine
from arlas_proc_ray.cdc.events import ChangelogConfig, changelog_dataset
from arlas_proc_ray.model import DataModel

CFG = ChangelogConfig(num_events=2000, num_keys=200, seed=44)


def _engine(tmp_path):
    eng = CdcEngine(str(tmp_path / "snap"), DataModel(num_partitions=4))
    eng.apply_epoch(changelog_dataset(CFG), 1)
    return eng


def test_verify_deep_clean(tmp_path, ray_session):
    eng = _engine(tmp_path)
    out = eng.store.verify_deep(recompute_hashes=True)
    assert out["ok"] and out["failed"] == []
    assert out["partitions"] == 4
    assert out["rows"] == eng.store.read_epoch_summary(1)["row_count"]


def test_verify_deep_detects_swapped_hash_column(tmp_path, ray_session):
    """Corrupt a stored content_sha256 value: rollup mismatch."""
    eng = _engine(tmp_path)
    store = eng.store
    path = store.part_data_path(1, 2)
    t = pq.read_table(path)
    shas = t.column("content_sha256").to_pylist()
    shas[0] = "0" * 64
    t = t.set_column(
        t.schema.get_field_index("content_sha256"),
        "content_sha256",
        pa.array(shas, pa.string()),
    )
    pq.write_table(t, path, compression="snappy")

    out = store.verify_deep()
    assert not out["ok"]
    assert [f["partition"] for f in out["failed"]] == [2]
    assert any("rollup" in e for e in out["failed"][0]["errors"])


def test_verify_deep_detects_silent_content_edit(tmp_path, ray_session):
    """Alter content but keep the stored hashes: only --recompute-hashes
    catches it (the rollup is over the stored hash column)."""
    eng = _engine(tmp_path)
    store = eng.store
    path = store.part_data_path(1, 1)
    t = pq.read_table(path)
    content = t.column("content").to_pylist()
    content[0] = (content[0] or "") + "TAMPERED"
    t = t.set_column(
        t.schema.get_field_index("content"),
        "content",
        pa.array(content, pa.string()),
    )
    pq.write_table(t, path, compression="snappy")

    shallow = store.verify_deep()
    assert shallow["ok"], "rollup alone cannot see a content edit"
    deep = store.verify_deep(recompute_hashes=True)
    assert not deep["ok"]
    assert [f["partition"] for f in deep["failed"]] == [1]
    assert any("content !=" in e for e in deep["failed"][0]["errors"])


def test_jobs_cli_verify_deep(tmp_path, ray_session, capsys):
    import json

    from arlas_proc_ray.jobs import main

    log = str(tmp_path / "log")
    snap = str(tmp_path / "snap")
    assert main(["synthesize", "--out", log, "--events", "1000"]) == 0
    assert main([
        "replay", "--events", log, "--snapshot", snap,
        "--epoch", "1", "--partitions", "4",
    ]) == 0
    assert main([
        "verify", "--snapshot", snap, "--deep", "--recompute-hashes",
    ]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["ok"] and out["failed"] == [] and out["partitions"] == 4


def test_verify_deep_incremental(tmp_path, ray_session):
    """Incremental audit keys on the SOURCE epoch (where the file
    physically lives): delta-referenced old files are skipped; files
    REWRITTEN without advancing the LSN fence (carry-forward, optimize)
    are re-verified."""
    from arlas_proc_ray.cdc.events import changelog_dataset

    cfg2 = ChangelogConfig(num_events=2000, num_keys=200, seed=45)
    eng = CdcEngine(str(tmp_path / "snap"), DataModel(num_partitions=16))
    eng.apply_epoch(changelog_dataset(cfg2, lo=0, hi=1000), 1)
    # delta epoch 2: untouched partitions stay as epoch-1 files
    # (4 events over 16 partitions cannot touch them all)
    eng.apply_epoch(changelog_dataset(cfg2, lo=1000, hi=1004), 2, delta=True)

    full = eng.store.verify_deep()
    incr = eng.store.verify_deep(changed_since_epoch=1)
    assert incr["ok"]
    assert incr["skipped"] > 0
    assert incr["partitions"] + incr["skipped"] == full["partitions"]
    assert incr["partitions"] < full["partitions"]

    # a same-fan-out rewrite (optimize) rewrites EVERY file with the OLD
    # lsn fence — the audit must not skip them: nothing lives at <= 2 now
    eng.repartition_snapshot(16, epoch=3)
    after = eng.store.verify_deep(changed_since_epoch=2)
    assert after["skipped"] == 0
    assert after["partitions"] == full["partitions"]
    # ...and keyed at the rewrite epoch everything skips again
    assert eng.store.verify_deep(changed_since_epoch=3)["skipped"] == 16
