"""Multi-table changelog demux: one multiplexed stream, per-table engines."""

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data as rd

from arlas_proc_ray.cdc.demux import demux_epoch
from arlas_proc_ray.cdc.engine import CdcEngine
from arlas_proc_ray.cdc.events import (
    ChangelogConfig,
    generate_changelog_tables,
)
from arlas_proc_ray.cdc.oracle import oracle_final_state
from arlas_proc_ray.model import DataModel

CFG_A = ChangelogConfig(num_events=2000, num_keys=200, seed=91)
CFG_B = ChangelogConfig(num_events=1500, num_keys=150, seed=92)


def _tag(tables, name):
    return [
        t.append_column("table", pa.array([name] * t.num_rows, pa.string()))
        for t in tables
    ]


def _mux(lo=None, hi=None):
    """Interleave two tables' changelogs into one multiplexed stream."""
    a = generate_changelog_tables(CFG_A, *(() if lo is None else (lo, hi)))
    b = generate_changelog_tables(CFG_B, *(() if lo is None else (lo, hi)))
    return _tag(a, "alpha") + _tag(b, "beta")


def test_demux_two_tables_match_oracles(tmp_path, ray_session):
    engines = {
        "alpha": CdcEngine(str(tmp_path / "a"), DataModel(num_partitions=4)),
        "beta": CdcEngine(str(tmp_path / "b"), DataModel(num_partitions=8)),
    }
    out = demux_epoch(
        rd.from_arrow(_mux()), engines, 1, spool_dir=str(tmp_path / "spool")
    )
    assert out["_spooled_events"] == CFG_A.num_events + CFG_B.num_events
    for name, cfg in [("alpha", CFG_A), ("beta", CFG_B)]:
        got = engines[name].final_state().to_pandas()
        exp = oracle_final_state(generate_changelog_tables(cfg)).to_pandas()
        pd.testing.assert_frame_equal(got, exp)


def test_demux_two_epochs_and_rerun_resume(tmp_path, ray_session):
    engines = {
        "alpha": CdcEngine(str(tmp_path / "a"), DataModel(num_partitions=4)),
        "beta": CdcEngine(str(tmp_path / "b"), DataModel(num_partitions=4)),
    }
    spool = str(tmp_path / "spool")
    demux_epoch(rd.from_arrow(_mux(0, 1000)), engines, 1, spool_dir=spool)
    demux_epoch(rd.from_arrow(_mux(1000, 1500)), engines, 2, spool_dir=spool)
    # rerun of epoch 2 (resume semantics): both tables report no-op
    again = demux_epoch(
        rd.from_arrow(_mux(1000, 1500)), engines, 2, spool_dir=spool
    )
    assert again["alpha"]["already_committed"] is True
    assert again["beta"]["already_committed"] is True
    # alpha saw all its events only through epoch... A: [0,1500) of 2000;
    # apply the tail as epoch 3 and compare both tables to their oracles
    demux_epoch(rd.from_arrow(_mux(1500, None)), engines, 3, spool_dir=spool)
    for name, cfg in [("alpha", CFG_A), ("beta", CFG_B)]:
        got = engines[name].final_state().to_pandas()
        exp = oracle_final_state(generate_changelog_tables(cfg)).to_pandas()
        pd.testing.assert_frame_equal(got, exp)


def test_demux_unknown_table(tmp_path, ray_session):
    engines = {
        "alpha": CdcEngine(str(tmp_path / "a"), DataModel(num_partitions=4)),
    }
    stream = _mux()  # contains beta events too
    with pytest.raises(Exception, match="unregistered table"):
        demux_epoch(
            rd.from_arrow(stream), engines, 1,
            spool_dir=str(tmp_path / "spool1"),
        )
    # with a DLQ, beta rows are quarantined and alpha applies cleanly
    engines2 = {
        "alpha": CdcEngine(str(tmp_path / "a2"), DataModel(num_partitions=4)),
    }
    dlq = str(tmp_path / "dlq")
    out = demux_epoch(
        rd.from_arrow(stream), engines2, 1,
        spool_dir=str(tmp_path / "spool2"), dead_letter_dir=dlq,
    )
    assert out["_spooled_events"] == CFG_A.num_events
    got = engines2["alpha"].final_state().to_pandas()
    exp = oracle_final_state(generate_changelog_tables(CFG_A)).to_pandas()
    pd.testing.assert_frame_equal(got, exp)

    from arlas_proc_ray.cdc.replay import read_dead_letters

    dl = read_dead_letters(dlq)
    assert dl.num_rows == CFG_B.num_events
    assert set(pc.unique(dl.column("dlq_reason")).to_pylist()) == {
        "unknown_table"
    }


def test_demux_rejects_lockstep_breaking_apply(tmp_path, ray_session):
    """An apply_fn that commits past the shared epoch number (an
    auto-split staged apply on an oversized slice) must fail LOUDLY at
    the first overshoot — with demux's shared-epoch fencing, a silent
    overshoot would make every later demux epoch for that table look
    already-committed and drop its events."""
    engines = {
        "alpha": CdcEngine(str(tmp_path / "a"), DataModel(num_partitions=4)),
        "beta": CdcEngine(str(tmp_path / "b"), DataModel(num_partitions=4)),
    }

    def oversplit_apply(eng, ds, epoch):
        mat = ds.materialize()
        # inject a budget that forces an inmem auto-split into >=2 epochs
        return eng.apply_epoch_staged(
            mat, epoch, budget_bytes=int((mat.size_bytes() or 1) * 3)
        )

    with pytest.raises(RuntimeError, match="lockstep"):
        demux_epoch(
            rd.from_arrow(_mux()), engines, 1,
            spool_dir=str(tmp_path / "spool"), apply_fn=oversplit_apply,
        )
