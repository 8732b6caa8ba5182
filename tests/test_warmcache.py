"""Warm partition-state cache (cdc/warmcache.py): hit accounting,
stale-cache fallback (rollback / out-of-band writer), crash-resume, and
interchangeability with the cold engine on one store."""

import pandas as pd
import pytest
import ray.data as rd

from arlas_proc_ray.cdc import (
    CdcEngine,
    ChangelogConfig,
    changelog_dataset,
    generate_changelog_tables,
    oracle_final_state,
)
from arlas_proc_ray.model import DataModel

CFG = ChangelogConfig(num_events=6_000, num_keys=500, num_repos=10, seed=21)


def _final(eng):
    return (
        eng.final_state()
        .to_pandas()
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )


def test_warm_epochs_hit_cache_and_match_oracle(tmp_path):
    dm = DataModel(num_partitions=8)
    tables = generate_changelog_tables(CFG)
    eng = CdcEngine(str(tmp_path / "s"), dm, warm_cache=True, warm_groups=4)
    try:
        for i, t in enumerate(tables, start=1):
            eng.apply_epoch_staged(rd.from_arrow(t), epoch=i)
        stats = eng.warm_cache_stats()
        hits = sum(s["hits"] for s in stats)
        misses = sum(s["misses"] for s in stats)
        # epoch 1 has no prior state (neither hit nor miss); every later
        # epoch's prior state must come from the cache, never the store
        n_epochs = len(tables)
        assert hits == dm.num_partitions * (n_epochs - 1)
        assert misses == 0
        # ownership stickiness: each actor owns a fixed partition subset
        owned = [set(s["cached_parts"]) for s in stats]
        for a, sa in enumerate(owned):
            for b in range(a + 1, len(owned)):
                assert not (sa & owned[b])
        exp = oracle_final_state(tables).to_pandas()
        pd.testing.assert_frame_equal(_final(eng)[list(exp.columns)], exp)
    finally:
        eng.shutdown_warm_pool()


def test_warm_cache_falls_back_after_out_of_band_write(tmp_path):
    """A rollback (or any writer outside the pool) changes the resolved
    source epoch — the cache must MISS and re-read, never serve stale."""
    dm = DataModel(num_partitions=4)
    cfg2 = ChangelogConfig(num_events=4_000, num_keys=300, seed=22)
    tables = generate_changelog_tables(cfg2)
    snap = str(tmp_path / "s")
    eng = CdcEngine(snap, dm, warm_cache=True, warm_groups=2)
    try:
        eng.apply_epoch_staged(rd.from_arrow(tables[0]), epoch=1)
        eng.apply_epoch_staged(rd.from_arrow(tables[1]), epoch=2)
        # roll back to epoch 1 (metadata-only commit of epoch 3) — the
        # pool cache still holds epoch-2 state for every partition
        eng.rollback(1)
        # re-apply the epoch-2 events on top of the rolled-back state
        s = eng.apply_epoch_staged(rd.from_arrow(tables[1]), epoch=4)
        stats = eng.warm_cache_stats()
        # the rolled-back sources resolve to epoch 1 != cached epoch 2:
        # all partitions must miss on the re-apply
        assert sum(st["misses"] for st in stats) == dm.num_partitions
        exp = oracle_final_state(tables[:2]).to_pandas()
        pd.testing.assert_frame_equal(_final(eng)[list(exp.columns)], exp)
        assert s["row_count"] == len(exp)
    finally:
        eng.shutdown_warm_pool()


def test_warm_cache_crash_resume(tmp_path):
    """A fault mid-epoch on the warm path resumes through the normal
    partition fences; finished partitions are skipped on re-run."""
    dm = DataModel(num_partitions=4)
    boom = {"armed": True}

    def fault(epoch, part):
        if boom["armed"] and epoch == 2 and part == 3:
            raise RuntimeError("injected crash")

    snap = str(tmp_path / "s")
    eng = CdcEngine(snap, dm, warm_cache=True, warm_groups=2,
                    fault_hook=fault)
    tables = generate_changelog_tables(CFG)
    try:
        eng.apply_epoch_staged(rd.from_arrow(tables[0]), epoch=1)
        with pytest.raises(Exception):
            eng.apply_epoch_staged(rd.from_arrow(tables[1]), epoch=2)
        boom["armed"] = False
        # resume with a FRESH engine (cold pool — cache is gone, exactly
        # the crash scenario); same epoch re-applies idempotently
        eng.shutdown_warm_pool()
        eng2 = CdcEngine(snap, dm, warm_cache=True, warm_groups=2)
        eng2.apply_epoch_staged(rd.from_arrow(tables[1]), epoch=2)
        for i, t in enumerate(tables[2:], start=3):
            eng2.apply_epoch_staged(rd.from_arrow(t), epoch=i)
        exp = oracle_final_state(tables).to_pandas()
        pd.testing.assert_frame_equal(_final(eng2)[list(exp.columns)], exp)
        eng2.shutdown_warm_pool()
    finally:
        eng.shutdown_warm_pool()


def test_warm_and_cold_interchange_on_one_store(tmp_path):
    """Warm and cold engines alternate epochs on one snapshot store."""
    dm = DataModel(num_partitions=4)
    cfg2 = ChangelogConfig(num_events=8_000, num_keys=600, seed=23)
    snap = str(tmp_path / "s")
    warm = CdcEngine(snap, dm, warm_cache=True, warm_groups=2)
    cold = CdcEngine(snap, dm)
    try:
        n = cfg2.num_events
        cuts = [0, n // 4, n // 2, 3 * n // 4, n]
        for i in range(4):
            ds = changelog_dataset(cfg2, lo=cuts[i], hi=cuts[i + 1])
            (warm if i % 2 == 0 else cold).apply_epoch_staged(
                ds, epoch=i + 1
            )
        exp = oracle_final_state(generate_changelog_tables(cfg2)).to_pandas()
        pd.testing.assert_frame_equal(_final(cold)[list(exp.columns)], exp)
        # the cold epochs wrote behind the pool's back: the warm epochs
        # that followed must have MISSED for every partition
        stats = warm.warm_cache_stats()
        assert sum(s["misses"] for s in stats) >= dm.num_partitions
    finally:
        warm.shutdown_warm_pool()
