"""Engine point lookup (cdc/engine.py:lookup): parity with final_state,
partition pruning (only routed files opened), epoch time travel."""

import pandas as pd
import pytest
import ray.data as rd

from arlas_proc_ray.cdc import (
    CdcEngine,
    ChangelogConfig,
    generate_changelog_tables,
)
from arlas_proc_ray.model import DataModel

CFG = ChangelogConfig(num_events=5_000, num_keys=400, seed=9)
DM = DataModel(num_partitions=16)


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("snap"))
    eng = CdcEngine(d, DM)
    mid = CFG.num_events // 2
    eng.apply_epoch(rd.from_arrow(generate_changelog_tables(CFG, 0, mid)), epoch=0)
    eng.apply_epoch(
        rd.from_arrow(generate_changelog_tables(CFG, mid, CFG.num_events)), epoch=1
    )
    return eng


def test_lookup_matches_final_state(engine):
    state = engine.final_state().to_pandas()
    some = list(
        state[["repo", "path"]].iloc[::37].itertuples(index=False, name=None)
    )
    got = (
        engine.lookup(some)
        .to_pandas()
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )
    exp = (
        state.merge(
            pd.DataFrame(some, columns=["repo", "path"]), on=["repo", "path"]
        )
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[exp.columns.tolist()], exp)


def test_lookup_missing_and_empty(engine):
    assert engine.lookup([]).num_rows == 0
    assert engine.lookup([("no-such-repo", "no-such-path")]).num_rows == 0


def test_lookup_prunes_partitions(engine, monkeypatch):
    state = engine.final_state().to_pandas()
    one = [tuple(state[["repo", "path"]].iloc[0])]
    opened = []
    orig = engine.store.read_partition_resolved

    def spy(e, p):
        opened.append(p)
        return orig(e, p)

    monkeypatch.setattr(engine.store, "read_partition_resolved", spy)
    got = engine.lookup(one)
    assert got.num_rows == 1
    assert len(opened) == 1  # exactly one partition file touched


def test_lookup_time_travel_epoch(engine):
    state0 = engine.final_state(epoch=0).to_pandas()
    keys = list(
        state0[["repo", "path"]].iloc[:5].itertuples(index=False, name=None)
    )
    got = engine.lookup(keys, epoch=0).to_pandas()
    exp = state0.merge(
        pd.DataFrame(keys, columns=["repo", "path"]), on=["repo", "path"]
    )
    assert sorted(got["last_lsn"]) == sorted(exp["last_lsn"])
