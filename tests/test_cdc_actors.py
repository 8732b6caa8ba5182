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
