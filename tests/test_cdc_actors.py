"""Streaming merge-actor engine: parity + restart-recovery."""

import pandas as pd
import ray.data as rd

from arlas_proc_ray.cdc import (
    ChangelogConfig,
    generate_changelog_tables,
    oracle_final_state,
)
from arlas_proc_ray.cdc.actors import StreamingCdcEngine
from arlas_proc_ray.model import DataModel

CFG = ChangelogConfig(num_events=3_000, num_keys=250, seed=9)
DM = DataModel(num_partitions=4)


def test_streaming_engine_parity(tmp_path):
    snap = str(tmp_path / "snap")
    exp = oracle_final_state(generate_changelog_tables(CFG)).to_pandas()

    engine = StreamingCdcEngine(snap, DM)
    try:
        s1 = engine.apply_epoch(
            rd.from_arrow(generate_changelog_tables(CFG, 0, 1_500)), epoch=1
        )
        assert s1["routed_events"] > 0
        s2 = engine.apply_epoch(
            rd.from_arrow(generate_changelog_tables(CFG, 1_500, 3_000)), epoch=2
        )
        got = (
            engine.final_state()
            .to_pandas()
            .sort_values(["repo", "path"])
            .reset_index(drop=True)[list(exp.columns)]
        )
        pd.testing.assert_frame_equal(got, exp)
    finally:
        engine.shutdown()


def test_streaming_engine_restart_recovers_state(tmp_path):
    """A fresh actor pool reloads state from the last committed epoch."""
    snap = str(tmp_path / "snap")
    exp = oracle_final_state(generate_changelog_tables(CFG)).to_pandas()

    e1 = StreamingCdcEngine(snap, DM)
    try:
        e1.apply_epoch(rd.from_arrow(generate_changelog_tables(CFG, 0, 1_500)), 1)
    finally:
        e1.shutdown()  # simulate process loss between epochs

    e2 = StreamingCdcEngine(snap, DM)  # actors reload epoch-1 state
    try:
        e2.apply_epoch(rd.from_arrow(generate_changelog_tables(CFG, 1_500, 3_000)), 2)
        got = (
            e2.final_state()
            .to_pandas()
            .sort_values(["repo", "path"])
            .reset_index(drop=True)[list(exp.columns)]
        )
        pd.testing.assert_frame_equal(got, exp)
    finally:
        e2.shutdown()


def test_streaming_tail_commit_cadence(tmp_path):
    """tail() commits an epoch per N routed events plus a final flush;
    state matches the full-replay oracle and epochs are fenced."""
    from arlas_proc_ray.cdc import (
        ChangelogConfig,
        generate_changelog_tables,
        oracle_final_state,
    )
    from arlas_proc_ray.cdc.actors import StreamingCdcEngine
    from arlas_proc_ray.model import DataModel

    cfg = ChangelogConfig(num_events=2_600, num_keys=300, seed=3)
    dm = DataModel(num_partitions=4)
    exp = oracle_final_state(generate_changelog_tables(cfg)).to_pandas()

    # feed 13 tables of 200 events, committing every >=500
    chunks = [
        generate_changelog_tables(cfg, i * 200, (i + 1) * 200) for i in range(13)
    ]
    eng = StreamingCdcEngine(str(tmp_path / "s"), dm)
    try:
        summaries = list(eng.tail(chunks, epoch_every_events=500))
        # ceil(2600/600-ish): routed counts shrink under the per-window LWW
        # combine, so just assert cadence bounds + total
        assert len(summaries) >= 2
        assert sum(s["routed_events"] for s in summaries) <= cfg.num_events
        epochs = [s["epoch"] for s in summaries]
        assert epochs == sorted(epochs) and len(set(epochs)) == len(epochs)
        got = (
            eng.final_state()
            .to_pandas()
            .sort_values(["repo", "path"])
            .reset_index(drop=True)[list(exp.columns)]
        )
        pd.testing.assert_frame_equal(got, exp)
        # watermark advanced to the last lsn
        assert eng.store.read_epoch_summary(epochs[-1])["last_lsn"] == 2_599
    finally:
        eng.shutdown()


def test_streaming_engine_spills_noncombinable_buffer(tmp_path):
    """With combinable=False and a tiny spill budget, the ingest buffer
    spills to <snapshot>/.spill instead of growing; commit reads the
    spilled tables back, result matches the oracle, and the scratch dir
    is cleaned after commit (round-2 ROADMAP item)."""
    import os

    import ray

    snap = str(tmp_path / "snap")
    exp = oracle_final_state(generate_changelog_tables(CFG)).to_pandas()

    engine = StreamingCdcEngine(
        snap, DM, spill_bytes=1, combinable=False  # spill on every ingest
    )
    try:
        engine.apply_epoch(
            rd.from_arrow(generate_changelog_tables(CFG, 0, 3_000)), epoch=1
        )
        # buffers were reset; spill scratch wiped after commit
        stats = ray.get([a.buffer_stats.remote() for a in engine.actors])
        assert all(s["rows"] == 0 and s["spilled_files"] == 0 for s in stats)
        spill_root = os.path.join(snap, ".spill")
        assert not os.path.exists(spill_root) or not any(
            files for _, _, files in os.walk(spill_root)
        )
        got = (
            engine.final_state()
            .to_pandas()
            .sort_values(["repo", "path"])
            .reset_index(drop=True)[list(exp.columns)]
        )
        pd.testing.assert_frame_equal(got, exp)
    finally:
        engine.shutdown()


def test_tail_crash_resume_with_source_cursor(tmp_path, ray_session):
    """The streaming replay contract: a coordinator crash loses the open
    window's routed-but-uncommitted buffer BY DESIGN — the source holds a
    cursor at the last committed watermark and replays from there. A
    fresh engine (new actors reload committed state) consuming the
    replayed feed converges to the oracle."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from arlas_proc_ray.cdc.actors import StreamingCdcEngine
    from arlas_proc_ray.cdc.events import (
        ChangelogConfig,
        generate_changelog_tables,
    )
    from arlas_proc_ray.cdc.oracle import oracle_final_state

    cfg = ChangelogConfig(num_events=3000, num_keys=300, seed=99)
    tables = generate_changelog_tables(cfg)
    # a feed of many small batches (the tail shape)
    batches = [t.slice(o, 500) for t in tables for o in range(0, t.num_rows, 500)]

    snap = str(tmp_path / "snap")
    eng1 = StreamingCdcEngine(snap, DataModel(num_partitions=4))
    # ooo_holdback >= the source's out-of-order bound: the committed
    # watermark never outruns an undelivered lower LSN, so "replay
    # lsn > watermark" is an exact cursor
    gen = eng1.tail(iter(batches), epoch_every_events=120,
                    ooo_holdback=cfg.ooo_window)
    first = next(gen)   # window 1 commits...
    next(gen)           # ...window 2 commits; then ABANDON mid-window-3
    del gen             # coordinator crash: open window's buffer is lost

    # restart: new engine, actors reload the last committed snapshot;
    # the SOURCE replays everything after its committed-watermark cursor
    eng2 = StreamingCdcEngine(snap, DataModel(num_partitions=4))
    last = eng2.store.latest_committed_epoch()
    assert last is not None and last >= first["epoch"]
    cursor = eng2.store.read_epoch_summary(last)["last_lsn"]
    replay = [
        t.filter(pc.greater(t.column("lsn"), pa.scalar(cursor)))
        for t in batches
    ]
    replay = [t for t in replay if t.num_rows]
    list(eng2.tail(iter(replay), epoch_every_events=120,
                   start_epoch=last + 1, ooo_holdback=cfg.ooo_window))

    got = eng2.final_state().to_pandas()
    exp = oracle_final_state(tables).to_pandas()
    pd.testing.assert_frame_equal(got, exp)
