"""Incrementally-maintained secondary (value→key) index (cdc/secondary.py).

Core invariant: an index refreshed through ANY chain of epochs equals the
index bootstrapped from the final state, tuple for tuple; lookups match a
full state scan, reading only the probed value partitions.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data as rd

from arlas_proc_ray.cdc import CdcEngine, ChangelogConfig, generate_changelog_tables
from arlas_proc_ray.cdc.events import EVENT_SCHEMA_V1
from arlas_proc_ray.cdc.secondary import (
    lookup_keys,
    read_secondary_checkpoint,
    read_secondary_index,
    refresh_secondary_index,
)
from arlas_proc_ray.model import DataModel

DM = DataModel(num_partitions=4)
IDX = dict(value_col="language", num_partitions=4)


def _event(lsn, *, repo="org", path=None, op="UPDATE", lang="py") -> pa.Table:
    path = path if path is not None else f"f{lsn}.src"
    return pa.Table.from_pylist(
        [{
            "lsn": lsn, "op": op, "repo": repo, "path": path,
            "commit": f"c{lsn}", "lang": None if op == "DELETE" else lang,
            "content": None if op == "DELETE" else f"body-{lsn}",
            "schema_version": 1, "delivery_index": lsn,
        }],
        schema=EVENT_SCHEMA_V1,
    )


def _sorted(pdf: pd.DataFrame) -> pd.DataFrame:
    return pdf.sort_values(["val", "key"], kind="mergesort").reset_index(
        drop=True
    )


def test_incremental_equals_bootstrap_after_mixed_epochs(tmp_path, ray_session):
    engine = CdcEngine(str(tmp_path / "snap"), DM)
    tables = generate_changelog_tables(
        ChangelogConfig(num_events=3_000, num_keys=250, seed=67)
    )
    mid = max(int(pc.max(t.column("lsn")).as_py()) for t in tables) // 2
    engine.apply_epoch(
        rd.from_arrow(
            [t.filter(pc.less_equal(t.column("lsn"), mid)) for t in tables]
        ),
        epoch=1,
    )
    r1 = refresh_secondary_index(engine.store, index_id="inc", **IDX)
    assert r1["mode"] == "bootstrap"
    engine.apply_epoch(
        rd.from_arrow(
            [t.filter(pc.greater(t.column("lsn"), mid)) for t in tables]
        ),
        epoch=2,
    )
    r2 = refresh_secondary_index(engine.store, index_id="inc", **IDX)
    assert r2["mode"] == "incremental"

    scratch = refresh_secondary_index(engine.store, index_id="scratch", **IDX)
    assert scratch["mode"] == "bootstrap"
    pd.testing.assert_frame_equal(
        _sorted(read_secondary_index(engine.store, "inc")),
        _sorted(read_secondary_index(engine.store, "scratch")),
    )
    assert engine.store.resolve_ref("secindex-inc") == 2
    r3 = refresh_secondary_index(engine.store, index_id="inc", **IDX)
    assert r3["mode"] == "noop"

    # lookup == full state scan for a sampled value
    state = engine.final_state().to_pandas()
    langs = state["language"].dropna().unique()
    v = sorted(langs)[0]
    got = lookup_keys(engine.store, [v], index_id="inc")
    exp = state[state["language"] == v]
    assert len(got) == len(exp)
    assert set(got["val"]) == {v}


def test_value_change_and_delete_retract(tmp_path, ray_session):
    engine = CdcEngine(str(tmp_path / "snap"), DM)
    engine.apply_epoch(
        rd.from_arrow([_event(1, path="a.py", lang="py"),
                       _event(2, path="b.rs", lang="rs")]),
        epoch=1,
    )
    refresh_secondary_index(engine.store, index_id="d", **IDX)
    assert set(read_secondary_index(engine.store, "d")["val"]) == {"py", "rs"}

    engine.apply_epoch(
        rd.from_arrow([_event(10, path="a.py", lang="go"),  # value moves
                       _event(11, path="b.rs", op="DELETE")]),
        epoch=2, delta=True,
    )
    r = refresh_secondary_index(engine.store, index_id="d", **IDX)
    assert r["mode"] == "incremental"
    idx = read_secondary_index(engine.store, "d")
    assert len(idx) == 1
    assert idx.iloc[0]["val"] == "go" and idx.iloc[0]["key"] == "org#a.py"
    assert len(lookup_keys(engine.store, ["py", "rs"], index_id="d")) == 0
    hit = lookup_keys(engine.store, ["go"], index_id="d")
    assert list(hit["key"]) == ["org#a.py"]


def test_nul_byte_values_stay_distinct(tmp_path, ray_session):
    engine = CdcEngine(str(tmp_path / "snap"), DM)
    engine.apply_epoch(
        rd.from_arrow([_event(1, path="x", lang="a\x00b"),
                       _event(2, path="y", lang="ab")]),
        epoch=1,
    )
    refresh_secondary_index(engine.store, index_id="d", **IDX)
    got = lookup_keys(engine.store, ["a\x00b"], index_id="d")
    assert list(got["key"]) == ["org#x"]
    got2 = lookup_keys(engine.store, ["ab"], index_id="d")
    assert list(got2["key"]) == ["org#y"]


def test_crash_before_checkpoint_is_idempotent(tmp_path, ray_session):
    engine = CdcEngine(str(tmp_path / "snap"), DM)
    engine.apply_epoch(
        rd.from_arrow([_event(i, lang=f"l{i % 3}") for i in range(1, 9)]),
        epoch=1,
    )
    refresh_secondary_index(engine.store, index_id="d", **IDX)
    engine.apply_epoch(
        rd.from_arrow([_event(20, path="f1.src", lang="l9")]),
        epoch=2, delta=True,
    )
    refresh_secondary_index(engine.store, index_id="d",
                            commit_checkpoint=False, **IDX)
    assert read_secondary_checkpoint(engine.store, "d")["epoch"] == 1
    r = refresh_secondary_index(engine.store, index_id="d", **IDX)
    assert r["mode"] == "incremental"
    scratch = refresh_secondary_index(engine.store, index_id="s", **IDX)
    pd.testing.assert_frame_equal(
        _sorted(read_secondary_index(engine.store, "d")),
        _sorted(read_secondary_index(engine.store, "s")),
    )


def test_stale_lookup_guard(tmp_path, ray_session):
    engine = CdcEngine(str(tmp_path / "snap"), DM)
    engine.apply_epoch(rd.from_arrow([_event(1)]), epoch=1)
    refresh_secondary_index(engine.store, index_id="d", **IDX)
    engine.apply_epoch(rd.from_arrow([_event(2)]), epoch=2, delta=True)
    with pytest.raises(RuntimeError, match="refresh_secondary_index"):
        lookup_keys(engine.store, ["py"], index_id="d", expect_epoch=2)


def test_fused_refresh_many_kits_equals_sequential(tmp_path, ray_session):
    """index_base.fused_refresh is generic over N kits: three secondary
    indexes on different payload columns, refreshed through ONE routed
    exchange, must be tuple-identical to three sequential refreshes —
    at bootstrap AND an incremental epoch (where untouched-column
    indexes stay untouched)."""
    from arlas_proc_ray.cdc.index_base import fused_refresh
    from arlas_proc_ray.cdc.secondary import _SecondaryIndex

    cols = ["language", "commit", "content"]

    def ingest(tag):
        e = CdcEngine(str(tmp_path / f"s{tag}"), DM)
        e.apply_epoch(
            rd.from_arrow(
                [_event(i, path=f"f{i}", lang=f"l{i % 3}")
                 for i in range(1, 9)]
            ),
            epoch=1,
        )
        return e

    def evolve(e):
        e.apply_epoch(
            rd.from_arrow([
                _event(20, path="f1", lang="l9"),      # language changes
                _event(21, path="f2", op="DELETE"),    # row gone
                _event(22, path="f9", lang="l0"),      # new row
            ]),
            epoch=2, delta=True,
        )

    def kits(e):
        return [
            _SecondaryIndex(
                e.store, f"ix-{c}",
                {"value_col": c, "key_cols": list(e.dm.key_cols),
                 "num_partitions": 3},
                3,
            )
            for c in cols
        ]

    # fused
    ef = ingest("f")
    planned = [(k, k.plan()) for k in kits(ef)]
    outs = fused_refresh(planned)
    assert all(o["mode"] == "bootstrap" for o in outs)
    evolve(ef)
    planned = [(k, k.plan()) for k in kits(ef)]
    outs = fused_refresh(planned)
    assert all(o["mode"] == "incremental" for o in outs)

    # sequential
    es = ingest("s")
    for k in kits(es):
        k.refresh()
    evolve(es)
    for k in kits(es):
        k.refresh()

    for c in cols:
        pd.testing.assert_frame_equal(
            _sorted(read_secondary_index(ef.store, f"ix-{c}")),
            _sorted(read_secondary_index(es.store, f"ix-{c}")),
        )
    # lookups prune identically on the fused-built index
    hit = lookup_keys(ef.store, ["l9"], index_id="ix-language")
    assert set(hit["key"]) == {"org#f1"}
