"""Cross-table atomic commit records (cdc/txn.py): no torn multi-table cuts."""

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from arlas_proc_ray.cdc.demux import demux_epoch
from arlas_proc_ray.cdc.engine import CdcEngine
from arlas_proc_ray.cdc.events import ChangelogConfig, generate_changelog_tables
from arlas_proc_ray.cdc.oracle import oracle_final_state
from arlas_proc_ray.cdc.txn import ConcurrentTxnError, TxnLog, consistent_final_states
from arlas_proc_ray.model import DataModel

CFG_A = ChangelogConfig(num_events=1200, num_keys=150, seed=61)
CFG_B = ChangelogConfig(num_events=900, num_keys=120, seed=62)


def _tag(tables, name):
    return [
        t.append_column("table", pa.array([name] * t.num_rows, pa.string()))
        for t in tables
    ]


def _mux(lo=None, hi=None):
    a = generate_changelog_tables(CFG_A, *(() if lo is None else (lo, hi)))
    b = generate_changelog_tables(CFG_B, *(() if lo is None else (lo, hi)))
    return _tag(a, "alpha") + _tag(b, "beta")


def test_txn_log_record_list_cut(tmp_path):
    log = TxnLog(str(tmp_path / "txn"))
    with pytest.raises(LookupError):
        log.cut()
    log.record(1, {"alpha": 1, "beta": 1})
    log.record(2, {"alpha": 2, "beta": 2})
    assert log.list_txns() == [1, 2]
    assert log.cut() == {"alpha": 2, "beta": 2}
    assert log.cut(1) == {"alpha": 1, "beta": 1}
    # idempotent rerun: identical content is a no-op
    log.record(2, {"alpha": 2, "beta": 2})
    # conflicting content under the same id must refuse
    with pytest.raises(ConcurrentTxnError):
        log.record(2, {"alpha": 2, "beta": 3})


def test_demux_publishes_txn_and_crash_leaves_previous_cut(tmp_path, ray_session):
    """A crash between per-table commits must not expose a torn cut."""
    log = TxnLog(str(tmp_path / "txn"))
    spool = str(tmp_path / "spool")

    def mk_engines(beta_fault=None):
        return {
            "alpha": CdcEngine(str(tmp_path / "a"), DataModel(num_partitions=4)),
            "beta": CdcEngine(
                str(tmp_path / "b"), DataModel(num_partitions=4),
                fault_hook=beta_fault,
            ),
        }

    engines = mk_engines()
    out1 = demux_epoch(
        rd.from_arrow(_mux(0, 700)), engines, 1, spool_dir=spool, txn_log=log
    )
    assert out1["_txn"]["tables"] == {"alpha": 1, "beta": 1}
    cut1_states = {
        n: t.to_pandas()
        for n, t in consistent_final_states(engines, log).items()
    }

    # epoch 2: alpha commits, then beta's engine crashes mid-epoch —
    # demux applies tables in sorted order, so alpha is already durable
    def beta_fault(epoch, part):
        if epoch == 2:
            raise RuntimeError("injected beta crash")

    engines = mk_engines(beta_fault)
    with pytest.raises(Exception, match="injected beta crash"):
        demux_epoch(
            rd.from_arrow(_mux(700, None)), engines, 2,
            spool_dir=spool, txn_log=log,
        )

    # torn state is real: alpha is at epoch 2, beta still at 1 ...
    assert engines["alpha"].store.latest_committed_epoch() == 2
    assert engines["beta"].store.latest_committed_epoch() == 1
    # ... but the consistent cut still resolves the epoch-1 record
    assert log.cut() == {"alpha": 1, "beta": 1}
    for name, df in consistent_final_states(engines, log).items():
        pd.testing.assert_frame_equal(df.to_pandas(), cut1_states[name])

    # rerun = resume: alpha reports already_committed, beta finishes,
    # and only THEN the txn-2 record publishes
    engines = mk_engines()
    out2 = demux_epoch(
        rd.from_arrow(_mux(700, None)), engines, 2, spool_dir=spool, txn_log=log
    )
    assert out2["alpha"]["already_committed"] is True
    assert out2["_txn"]["tables"] == {"alpha": 2, "beta": 2}
    assert log.cut() == {"alpha": 2, "beta": 2}

    # the advanced cut matches both tables' independent oracles
    states = consistent_final_states(engines, log)
    for name, cfg in [("alpha", CFG_A), ("beta", CFG_B)]:
        exp = oracle_final_state(generate_changelog_tables(cfg)).to_pandas()
        pd.testing.assert_frame_equal(states[name].to_pandas(), exp)
