"""Named epoch refs (tags): atomic promotion pointers with vacuum safety."""

import json

import pandas as pd
import pytest

from arlas_proc_ray.cdc.engine import CdcEngine
from arlas_proc_ray.cdc.events import ChangelogConfig, changelog_dataset
from arlas_proc_ray.model import DataModel

CFG = ChangelogConfig(num_events=3000, num_keys=300, seed=33)


def _engine(tmp_path):
    eng = CdcEngine(str(tmp_path / "snap"), DataModel(num_partitions=4))
    eng.apply_epoch(changelog_dataset(CFG, lo=0, hi=1500), 1)
    eng.apply_epoch(changelog_dataset(CFG, lo=1500, hi=3000), 2, delta=True)
    return eng


def test_tag_scan_and_promotion(tmp_path, ray_session):
    eng = _engine(tmp_path)
    store = eng.store
    assert store.tag("v1", epoch=1) == 1
    assert store.tag("prod") == 2  # default: latest committed
    assert store.list_refs() == {"prod": 2, "v1": 1}

    # scanning by ref == scanning by the pinned epoch
    by_ref = store.scan(epoch="v1").to_pandas().sort_values("path")
    by_num = store.scan(epoch=1).to_pandas().sort_values("path")
    pd.testing.assert_frame_equal(
        by_ref.reset_index(drop=True), by_num.reset_index(drop=True)
    )
    assert store.plan_scan(epoch="prod")["epoch"] == 2

    # read_state accepts refs too
    assert store.read_state("v1").num_rows == len(by_ref)

    # promotion is a pointer flip
    store.tag("prod", epoch=1)
    assert store.resolve_ref("prod") == 1
    store.delete_ref("v1")
    with pytest.raises(KeyError):
        store.resolve_ref("v1")


def test_tag_validation(tmp_path, ray_session):
    eng = _engine(tmp_path)
    with pytest.raises(ValueError, match="not committed"):
        eng.store.tag("bad", epoch=99)
    with pytest.raises(ValueError, match="invalid ref"):
        eng.store.tag("../escape")


def test_vacuum_keeps_tagged_epochs(tmp_path, ray_session):
    eng = _engine(tmp_path)
    store = eng.store
    # epoch 2 is a delta referencing epoch 1's untouched partitions, so 1
    # survives anyway; add epoch 3 so there's something to vacuum
    eng.apply_epoch(changelog_dataset(CFG, lo=0, hi=10), 3)

    store.tag("pinned", epoch=1)
    first = store.vacuum(keep_last=1)
    assert 1 not in first, "tagged epoch must survive vacuum"
    assert 2 in first, "untagged epoch 2 is reclaimed"
    # tagged epoch still scannable after vacuum
    assert store.scan(epoch="pinned").count() > 0

    store.delete_ref("pinned")
    second = store.vacuum(keep_last=1)
    assert set(first) | set(second) == {1, 2}
    assert store.latest_committed_epoch() == 3


def test_jobs_cli_tag_and_scan_by_ref(tmp_path, ray_session, capsys):
    from arlas_proc_ray.jobs import main

    log = str(tmp_path / "log")
    snap = str(tmp_path / "snap")
    assert main(["synthesize", "--out", log, "--events", "1000"]) == 0
    assert main([
        "replay", "--events", log, "--snapshot", snap,
        "--epoch", "1", "--partitions", "4",
    ]) == 0
    assert main(["tag", "--snapshot", snap, "--set", "prod"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out == {"ref": "prod", "epoch": 1}
    assert main(["scan", "--snapshot", snap, "--epoch", "prod"]) == 0
    sc = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert sc["epoch"] == 1 and sc["rows"] > 0
    assert main(["tag", "--snapshot", snap]) == 0
    ls = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert ls == {"refs": {"prod": 1}}


def test_optimistic_concurrency_commit_fence(tmp_path, ray_session):
    """A writer that planned against an older epoch must not publish over
    an interleaved commit; re-committing the SAME epoch stays benign."""
    from arlas_proc_ray.cdc.snapshot import ConcurrentCommitError

    eng = _engine(tmp_path)  # commits epochs 1 and 2
    store = eng.store

    # writer planned against epoch 1, but epoch 2 landed meanwhile
    with pytest.raises(ConcurrentCommitError, match="latest committed is now 2"):
        store.commit_epoch(3, 4, expected_prev=1)

    # a racing DUPLICATE writer of the committed epoch is also rejected —
    # its partitions may have interleaved with the winner's through the
    # partition_done fences (single-writer retries never reach commit:
    # the engine rejects re-applying a committed epoch earlier)
    with pytest.raises(ConcurrentCommitError):
        store.commit_epoch(2, 4, expected_prev=1)

    # correct fence: planned against the true latest
    eng.apply_epoch(changelog_dataset(CFG, lo=0, hi=50), 3)
    assert store.latest_committed_epoch() == 3


def test_numeric_ref_names_rejected(tmp_path, ray_session):
    """Digit-only tags would shadow epoch numbers in every CLI that takes
    'epoch number or ref' (scan --epoch, rollback --to)."""
    eng = _engine(tmp_path)
    with pytest.raises(ValueError, match="numeric"):
        eng.store.tag("2")
    with pytest.raises(ValueError, match="numeric"):
        eng.store.tag("-3", epoch=1)
