"""Incrementally-maintained materialized join view (cdc/joinview.py).

Core invariant: a view refreshed through ANY interleaving of fact-side
and dimension-side epochs equals the view bootstrapped from the final
states — which itself equals a plain pandas LEFT JOIN oracle.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from arlas_proc_ray.cdc import CdcEngine
from arlas_proc_ray.cdc.events import EVENT_SCHEMA_V1
from arlas_proc_ray.cdc.joinview import (
    read_join_checkpoint,
    read_join_view,
    refresh_join_view,
)
from arlas_proc_ray.model import DataModel

DM_A = DataModel(num_partitions=4)
DM_B = DataModel(key_cols=("repo",), num_partitions=4)
VIEW = dict(fk_col="language", a_cols=["content"], b_cols=["content"],
            num_partitions=4)


def _a_event(lsn, *, path, op="UPDATE", fk="d1", body=None) -> pa.Table:
    return pa.Table.from_pylist(
        [{
            "lsn": lsn, "op": op, "repo": "facts", "path": path,
            "commit": f"c{lsn}",
            "lang": None if op == "DELETE" else fk,
            "content": None if op == "DELETE" else (body or f"fact-{lsn}"),
            "schema_version": 1, "delivery_index": lsn,
        }],
        schema=EVENT_SCHEMA_V1,
    )


def _b_event(lsn, *, key, op="UPDATE", attr=None) -> pa.Table:
    return pa.Table.from_pylist(
        [{
            "lsn": lsn, "op": op, "repo": key, "path": "d",
            "commit": f"c{lsn}", "lang": "x",
            "content": None if op == "DELETE" else (attr or f"dim-{key}"),
            "schema_version": 1, "delivery_index": lsn,
        }],
        schema=EVENT_SCHEMA_V1,
    )


def _oracle(engine_a, engine_b) -> pd.DataFrame:
    a = engine_a.final_state().to_pandas()
    b = engine_b.final_state().to_pandas()
    out = pd.DataFrame(
        {
            "key": a["repo"].astype(str).str.replace("\\", "\\\\", regex=False)
            .str.replace("#", "\\#", regex=False)
            + "#"
            + a["path"].astype(str).str.replace("\\", "\\\\", regex=False)
            .str.replace("#", "\\#", regex=False),
            "language": a["language"].astype(object),
            "content": a["content"].astype(object),
        }
    )
    bmap = dict(zip(b["repo"].astype(str), b["content"].astype(object)))
    out["b_content"] = out["language"].map(
        lambda v: bmap.get(v) if isinstance(v, str) else None
    )
    out["b_content"] = out["b_content"].where(out["b_content"].notna(), None)
    return out.sort_values("key", kind="mergesort").reset_index(drop=True)


def _sorted(pdf: pd.DataFrame) -> pd.DataFrame:
    return pdf.sort_values("key", kind="mergesort").reset_index(drop=True)


def _mk(tmp_path):
    return (
        CdcEngine(str(tmp_path / "a"), DM_A),
        CdcEngine(str(tmp_path / "b"), DM_B),
    )


def test_bootstrap_matches_left_join(tmp_path, ray_session):
    ea, eb = _mk(tmp_path)
    ea.apply_epoch(
        rd.from_arrow(
            [_a_event(i, path=f"f{i}", fk=f"d{i % 3}") for i in range(1, 9)]
            + [_a_event(9, path="orphan", fk="missing")]
        ),
        epoch=1,
    )
    eb.apply_epoch(
        rd.from_arrow([_b_event(i, key=f"d{i}") for i in range(3)]), epoch=1
    )
    r = refresh_join_view(ea, eb, view_id="v", **VIEW)
    assert r["mode"] == "bootstrap" and r["b_epoch"] == 1
    got = _sorted(read_join_view(ea.store, "v"))
    pd.testing.assert_frame_equal(got, _oracle(ea, eb))
    # left-join semantics: the orphan fact row is present with NULL b side
    orphan = got[got["key"] == "facts#orphan"]
    assert len(orphan) == 1 and orphan.iloc[0]["b_content"] is None


def test_fact_side_incremental_iud(tmp_path, ray_session):
    ea, eb = _mk(tmp_path)
    ea.apply_epoch(
        rd.from_arrow([_a_event(i, path=f"f{i}", fk="d0") for i in (1, 2, 3)]),
        epoch=1,
    )
    eb.apply_epoch(
        rd.from_arrow([_b_event(i, key=f"d{i}") for i in (0, 1)]), epoch=1
    )
    refresh_join_view(ea, eb, view_id="v", **VIEW)
    ea.apply_epoch(
        rd.from_arrow([
            _a_event(10, path="f4", fk="d1"),                   # insert
            _a_event(11, path="f1", fk="d1", body="moved"),     # update (fk moves)
            _a_event(12, path="f2", op="DELETE"),               # delete
        ]),
        epoch=2, delta=True,
    )
    r = refresh_join_view(ea, eb, view_id="v", **VIEW)
    assert r["mode"] == "incremental"
    got = _sorted(read_join_view(ea.store, "v"))
    pd.testing.assert_frame_equal(got, _oracle(ea, eb))
    assert "facts#f2" not in set(got["key"])
    moved = got[got["key"] == "facts#f1"].iloc[0]
    assert moved["b_content"] == "dim-d1" and moved["content"] == "moved"


def test_dim_side_incremental_update_delete_reinsert(tmp_path, ray_session):
    ea, eb = _mk(tmp_path)
    ea.apply_epoch(
        rd.from_arrow(
            [_a_event(i, path=f"f{i}", fk=f"d{i % 2}") for i in range(1, 7)]
        ),
        epoch=1,
    )
    eb.apply_epoch(
        rd.from_arrow([_b_event(i, key=f"d{i}") for i in (0, 1)]), epoch=1
    )
    refresh_join_view(ea, eb, view_id="v", **VIEW)

    # dim value update propagates to every referencing fact row
    eb.apply_epoch(
        rd.from_arrow([_b_event(10, key="d0", attr="renamed")]),
        epoch=2, delta=True,
    )
    r = refresh_join_view(ea, eb, view_id="v", **VIEW)
    assert r["mode"] == "incremental"
    got = read_join_view(ea.store, "v")
    pd.testing.assert_frame_equal(_sorted(got), _oracle(ea, eb))
    assert set(got.loc[got["language"] == "d0", "b_content"]) == {"renamed"}

    # dim delete degrades to left-join NULLs …
    eb.apply_epoch(
        rd.from_arrow([_b_event(20, key="d1", op="DELETE")]),
        epoch=3, delta=True,
    )
    refresh_join_view(ea, eb, view_id="v", **VIEW)
    got = read_join_view(ea.store, "v")
    pd.testing.assert_frame_equal(_sorted(got), _oracle(ea, eb))
    assert set(got.loc[got["language"] == "d1", "b_content"]) == {None}

    # … and a re-insert restores them
    eb.apply_epoch(
        rd.from_arrow([_b_event(30, key="d1", attr="back")]),
        epoch=4, delta=True,
    )
    refresh_join_view(ea, eb, view_id="v", **VIEW)
    got = read_join_view(ea.store, "v")
    pd.testing.assert_frame_equal(_sorted(got), _oracle(ea, eb))
    assert set(got.loc[got["language"] == "d1", "b_content"]) == {"back"}


def test_both_sides_change_same_refresh(tmp_path, ray_session):
    ea, eb = _mk(tmp_path)
    ea.apply_epoch(
        rd.from_arrow(
            [_a_event(i, path=f"f{i}", fk=f"d{i % 2}") for i in range(1, 5)]
        ),
        epoch=1,
    )
    eb.apply_epoch(
        rd.from_arrow([_b_event(i, key=f"d{i}") for i in (0, 1)]), epoch=1
    )
    refresh_join_view(ea, eb, view_id="v", **VIEW)
    ea.apply_epoch(
        rd.from_arrow([
            _a_event(10, path="f1", fk="d1", body="switched"),
            _a_event(11, path="f9", fk="d0"),
        ]),
        epoch=2, delta=True,
    )
    eb.apply_epoch(
        rd.from_arrow([_b_event(12, key="d0", attr="newdim")]),
        epoch=2, delta=True,
    )
    r = refresh_join_view(ea, eb, view_id="v", **VIEW)
    assert r["mode"] == "incremental"
    pd.testing.assert_frame_equal(
        _sorted(read_join_view(ea.store, "v")), _oracle(ea, eb)
    )
    # equality with a from-scratch rebuild, tuple for tuple
    refresh_join_view(ea, eb, view_id="scratch", **VIEW)
    pd.testing.assert_frame_equal(
        _sorted(read_join_view(ea.store, "v")),
        _sorted(read_join_view(ea.store, "scratch")),
    )


def test_noop_and_crash_idempotence(tmp_path, ray_session):
    ea, eb = _mk(tmp_path)
    ea.apply_epoch(rd.from_arrow([_a_event(1, path="f1", fk="d0")]), epoch=1)
    eb.apply_epoch(rd.from_arrow([_b_event(1, key="d0")]), epoch=1)
    refresh_join_view(ea, eb, view_id="v", **VIEW)
    assert refresh_join_view(ea, eb, view_id="v", **VIEW)["mode"] == "noop"

    ea.apply_epoch(
        rd.from_arrow([_a_event(10, path="f2", fk="d0")]), epoch=2, delta=True
    )
    # crash after part writes, before the checkpoint moved
    refresh_join_view(ea, eb, view_id="v", commit_checkpoint=False, **VIEW)
    assert read_join_checkpoint(ea.store, "v")["epoch"] == 1
    r = refresh_join_view(ea, eb, view_id="v", **VIEW)
    assert r["mode"] == "incremental"
    pd.testing.assert_frame_equal(
        _sorted(read_join_view(ea.store, "v")), _oracle(ea, eb)
    )


def test_composite_b_key_rejected(tmp_path, ray_session):
    ea, eb = _mk(tmp_path)
    eb_bad = CdcEngine(str(tmp_path / "b2"), DM_A)  # composite key
    ea.apply_epoch(rd.from_arrow([_a_event(1, path="f1")]), epoch=1)
    with pytest.raises(ValueError, match="single-column"):
        refresh_join_view(ea, eb_bad, view_id="v", **VIEW)


def test_fused_refresh_equals_sequential(tmp_path, ray_session):
    """VERDICT r4 #3: the fused path (one shared A read, one routed
    exchange for fk index + view) must be byte-identical — view rows AND
    fk-index rows — to the sequential path (index first, then view),
    across bootstrap and a both-sides incremental epoch. Also pins the
    fallback: a sec index already at target (mode mismatch) still
    refreshes the view correctly via the sequential route."""
    from arlas_proc_ray.cdc.joinview import _fk_index_id
    from arlas_proc_ray.cdc.secondary import (
        read_secondary_index,
        refresh_secondary_index,
    )

    def ingest(tag):
        ea = CdcEngine(str(tmp_path / f"a{tag}"), DM_A)
        eb = CdcEngine(str(tmp_path / f"b{tag}"), DM_B)
        ea.apply_epoch(
            rd.from_arrow(
                [_a_event(i, path=f"f{i}", fk=f"d{i % 4}")
                 for i in range(1, 10)]
            ),
            epoch=1,
        )
        eb.apply_epoch(
            rd.from_arrow([_b_event(i, key=f"d{i}") for i in range(3)]),
            epoch=1,
        )
        return ea, eb

    def evolve(ea, eb):
        ea.apply_epoch(
            rd.from_arrow([
                _a_event(20, path="f10", fk="d1"),
                _a_event(21, path="f1", fk="d2", body="moved"),
                _a_event(22, path="f3", op="DELETE"),
            ]),
            epoch=2, delta=True,
        )
        eb.apply_epoch(
            rd.from_arrow([
                _b_event(30, key="d0", attr="dim-d0-v2"),
                _b_event(31, key="d2", op="DELETE"),
            ]),
            epoch=2, delta=True,
        )

    # fused: the default refresh_join_view path
    ea_f, eb_f = ingest("f")
    r1 = refresh_join_view(ea_f, eb_f, view_id="v", **VIEW)
    assert r1["mode"] == "bootstrap"
    evolve(ea_f, eb_f)
    r2 = refresh_join_view(ea_f, eb_f, view_id="v", **VIEW)
    assert r2["mode"] == "incremental"

    # sequential: index strictly first, then the view kit alone
    ea_s, eb_s = ingest("s")
    from arlas_proc_ray.cdc.joinview import _JoinView, _spec

    def seq_refresh(ea, eb):
        refresh_secondary_index(
            ea.store, index_id=_fk_index_id("v"), value_col="language",
            key_cols=ea.dm.key_cols, num_partitions=VIEW["num_partitions"],
        )
        kit = _JoinView(
            ea, eb, "v",
            _spec(ea, eb, VIEW["fk_col"], VIEW["a_cols"], VIEW["b_cols"],
                  "repo", VIEW["num_partitions"]),
        )
        kit.b_target = eb.store._resolve_epoch_arg(None)
        out = kit.refresh()
        out["b_epoch"] = kit.b_target
        return out

    s1 = seq_refresh(ea_s, eb_s)
    assert s1["mode"] == "bootstrap"
    evolve(ea_s, eb_s)
    s2 = seq_refresh(ea_s, eb_s)
    assert s2["mode"] == "incremental"

    pd.testing.assert_frame_equal(
        _sorted(read_join_view(ea_f.store, "v")),
        _sorted(read_join_view(ea_s.store, "v")),
    )
    pd.testing.assert_frame_equal(
        read_secondary_index(ea_f.store, _fk_index_id("v"))
        .sort_values(["val", "key"]).reset_index(drop=True),
        read_secondary_index(ea_s.store, _fk_index_id("v"))
        .sort_values(["val", "key"]).reset_index(drop=True),
    )
    # both equal the pandas LEFT JOIN oracle
    pd.testing.assert_frame_equal(
        _sorted(read_join_view(ea_f.store, "v")), _oracle(ea_f, eb_f)
    )

    # fallback: sec index already refreshed to target separately → the
    # fused plan is not applicable; the view must still come out right
    ea_m, eb_m = ingest("m")
    refresh_join_view(ea_m, eb_m, view_id="v", **VIEW)
    evolve(ea_m, eb_m)
    refresh_secondary_index(
        ea_m.store, index_id=_fk_index_id("v"), value_col="language",
        key_cols=ea_m.dm.key_cols, num_partitions=VIEW["num_partitions"],
    )  # index now at epoch 2, view still at 1 → base mismatch
    r = refresh_join_view(ea_m, eb_m, view_id="v", **VIEW)
    assert r["mode"] == "incremental"
    pd.testing.assert_frame_equal(
        _sorted(read_join_view(ea_m.store, "v")), _oracle(ea_m, eb_m)
    )
