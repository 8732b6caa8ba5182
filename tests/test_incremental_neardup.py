"""Incrementally-maintained LSH near-dup index (dedup/incremental.py).

Core invariant: an index refreshed through ANY chain of epochs equals
the index bootstrapped from the final state, tuple for tuple (signatures
are seeded-deterministic). Probing answers "which docs changed this
epoch are near-dups of anything in the corpus" without rescanning it.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from arlas_proc_ray.cdc import CdcEngine, ChangelogConfig, generate_changelog_tables
from arlas_proc_ray.cdc.events import EVENT_SCHEMA_V1
from arlas_proc_ray.dedup.incremental import (
    epoch_near_duplicates,
    read_index,
    read_index_checkpoint,
    refresh_neardup_index,
)
from arlas_proc_ray.model import DataModel

DM = DataModel(num_partitions=4)
IDX = dict(num_perm=32, bands=16, ngram=5, num_partitions=4)

BASE_TEXT = (
    "the quick brown fox jumps over the lazy dog while the band plays "
    "a slow waltz in the crowded station hall and nobody notices the "
    "clock striking thirteen on a cold bright day in april"
)
OTHER_TEXT = (
    "import numpy as np\nimport pandas as pd\n\ndef main():\n"
    "    frame = pd.DataFrame({'x': np.arange(100)})\n"
    "    return frame.describe()\n"
)


def _event(lsn, *, repo="org9/solo", path="only.py", op="UPDATE",
           content=BASE_TEXT) -> pa.Table:
    return pa.Table.from_pylist(
        [{
            "lsn": lsn, "op": op, "repo": repo, "path": path,
            "commit": f"c{lsn}", "lang": "py",
            "content": None if op == "DELETE" else content,
            "schema_version": 1, "delivery_index": lsn,
        }],
        schema=EVENT_SCHEMA_V1,
    )


def _sorted_triples(pdf: pd.DataFrame) -> pd.DataFrame:
    return (
        pdf.assign(band_hash=pdf["band_hash"].astype(np.uint64))
        .sort_values(["band_id", "band_hash", "key"], kind="mergesort")
        .reset_index(drop=True)
    )


def test_incremental_equals_bootstrap_after_mixed_epochs(tmp_path, ray_session):
    engine = CdcEngine(str(tmp_path / "snap"), DM)
    tables = generate_changelog_tables(
        ChangelogConfig(num_events=3_000, num_keys=250, seed=61)
    )
    mid = max(int(pc.max(t.column("lsn")).as_py()) for t in tables) // 2
    engine.apply_epoch(
        rd.from_arrow([t.filter(pc.less_equal(t.column("lsn"), mid)) for t in tables]),
        epoch=1,
    )
    r1 = refresh_neardup_index(engine.store, index_id="inc", **IDX)
    assert r1["mode"] == "bootstrap"
    # second epoch carries inserts, updates AND deletes from the generator
    engine.apply_epoch(
        rd.from_arrow([t.filter(pc.greater(t.column("lsn"), mid)) for t in tables]),
        epoch=2,
    )
    r2 = refresh_neardup_index(engine.store, index_id="inc", **IDX)
    assert r2["mode"] == "incremental"
    assert r2["rows_added"] > 0 and r2["rows_removed"] > 0

    scratch = refresh_neardup_index(engine.store, index_id="scratch", **IDX)
    assert scratch["mode"] == "bootstrap"
    pd.testing.assert_frame_equal(
        _sorted_triples(read_index(engine.store, "inc")),
        _sorted_triples(read_index(engine.store, "scratch")),
    )
    assert engine.store.resolve_ref("neardup-inc") == 2

    # noop refresh
    r3 = refresh_neardup_index(engine.store, index_id="inc", **IDX)
    assert r3["mode"] == "noop"


def test_probe_finds_planted_near_dup_and_skips_dissimilar(tmp_path, ray_session):
    engine = CdcEngine(str(tmp_path / "snap"), DM)
    engine.apply_epoch(rd.from_arrow([_event(1)]), epoch=1)
    refresh_neardup_index(engine.store, index_id="d", **IDX)
    # epoch 2: one near-dup of the existing doc, one unrelated doc
    engine.apply_epoch(
        rd.from_arrow([
            _event(10, repo="r2", path="near.py",
                   content=BASE_TEXT + " extra tail"),
            _event(11, repo="r3", path="far.py", content=OTHER_TEXT),
        ]),
        epoch=2, delta=True,
    )
    refresh_neardup_index(engine.store, index_id="d", **IDX)
    pairs = epoch_near_duplicates(
        engine.store, index_id="d", base=1, target=2,
        jaccard_threshold=0.7,
    ).to_pandas()
    assert len(pairs) == 1
    row = pairs.iloc[0]
    assert {row["doc_a"], row["doc_b"]} == {"org9/solo#only.py", "r2#near.py"}
    assert row["jaccard"] >= 0.7


def test_update_retracts_stale_buckets(tmp_path, ray_session):
    engine = CdcEngine(str(tmp_path / "snap"), DM)
    engine.apply_epoch(rd.from_arrow([_event(1)]), epoch=1)
    refresh_neardup_index(engine.store, index_id="d", **IDX)
    # rewrite the doc completely
    engine.apply_epoch(
        rd.from_arrow([_event(10, content=OTHER_TEXT)]), epoch=2, delta=True
    )
    r = refresh_neardup_index(engine.store, index_id="d", **IDX)
    assert r["rows_removed"] > 0
    # epoch 3: near-dup of the OLD content -> must NOT pair (stale bands
    # were retracted); near-dup of the NEW content -> must pair
    engine.apply_epoch(
        rd.from_arrow([
            _event(20, repo="r2", path="oldish.py",
                   content=BASE_TEXT + " tail"),
            _event(21, repo="r3", path="newish.py",
                   content=OTHER_TEXT + "# trailing comment\n"),
        ]),
        epoch=3, delta=True,
    )
    refresh_neardup_index(engine.store, index_id="d", **IDX)
    pairs = epoch_near_duplicates(
        engine.store, index_id="d", base=2, target=3,
        jaccard_threshold=0.6,
    ).to_pandas()
    partners = {
        frozenset((r["doc_a"], r["doc_b"])) for _, r in pairs.iterrows()
    }
    assert frozenset(("org9/solo#only.py", "r3#newish.py")) in partners
    assert not any("r2#oldish.py" in fs for fs in partners)


def test_delete_then_similar_insert_finds_nothing(tmp_path, ray_session):
    engine = CdcEngine(str(tmp_path / "snap"), DM)
    engine.apply_epoch(rd.from_arrow([_event(1)]), epoch=1)
    refresh_neardup_index(engine.store, index_id="d", **IDX)
    engine.apply_epoch(
        rd.from_arrow([_event(10, op="DELETE")]), epoch=2, delta=True
    )
    refresh_neardup_index(engine.store, index_id="d", **IDX)
    engine.apply_epoch(
        rd.from_arrow([
            _event(20, repo="r2", path="near.py",
                   content=BASE_TEXT + " tail"),
        ]),
        epoch=3, delta=True,
    )
    refresh_neardup_index(engine.store, index_id="d", **IDX)
    pairs = epoch_near_duplicates(
        engine.store, index_id="d", base=2, target=3,
        jaccard_threshold=0.5,
    ).to_pandas()
    assert len(pairs) == 0


def test_two_changed_docs_pair_once(tmp_path, ray_session):
    engine = CdcEngine(str(tmp_path / "snap"), DM)
    engine.apply_epoch(
        rd.from_arrow([_event(1, repo="r0", path="seed.py",
                              content=OTHER_TEXT)]),
        epoch=1,
    )
    refresh_neardup_index(engine.store, index_id="d", **IDX)
    engine.apply_epoch(
        rd.from_arrow([
            _event(10, repo="a", path="x.py", content=BASE_TEXT + " one"),
            _event(11, repo="b", path="y.py", content=BASE_TEXT + " two"),
        ]),
        epoch=2, delta=True,
    )
    refresh_neardup_index(engine.store, index_id="d", **IDX)
    pairs = epoch_near_duplicates(
        engine.store, index_id="d", base=1, target=2,
        jaccard_threshold=0.7,
    ).to_pandas()
    assert len(pairs) == 1
    assert {pairs["doc_a"].iloc[0], pairs["doc_b"].iloc[0]} == {
        "a#x.py", "b#y.py"
    }


def test_crash_before_checkpoint_is_idempotent(tmp_path, ray_session):
    engine = CdcEngine(str(tmp_path / "snap"), DM)
    tables = generate_changelog_tables(
        ChangelogConfig(num_events=1_500, num_keys=120, seed=67)
    )
    engine.apply_epoch(rd.from_arrow(tables), epoch=1)
    refresh_neardup_index(engine.store, index_id="d", **IDX)
    engine.apply_epoch(
        rd.from_arrow([_event(9_000, content=BASE_TEXT + " v2")]),
        epoch=2, delta=True,
    )
    r_crash = refresh_neardup_index(
        engine.store, index_id="d", commit_checkpoint=False, **IDX
    )
    assert read_index_checkpoint(engine.store, "d")["epoch"] == 1
    r_retry = refresh_neardup_index(engine.store, index_id="d", **IDX)
    assert r_retry["mode"] == "incremental"
    assert read_index_checkpoint(engine.store, "d")["epoch"] == 2
    scratch = refresh_neardup_index(engine.store, index_id="s", **IDX)
    pd.testing.assert_frame_equal(
        _sorted_triples(read_index(engine.store, "d")),
        _sorted_triples(read_index(engine.store, "s")),
    )
    assert r_crash["rows_added"] == r_retry["rows_added"]


def test_store_fanout_change_forces_rebuild(tmp_path, ray_session):
    engine = CdcEngine(str(tmp_path / "snap"), DM)
    engine.apply_epoch(rd.from_arrow([_event(1)]), epoch=1)
    refresh_neardup_index(engine.store, index_id="d", **IDX)
    engine.repartition_snapshot(8, epoch=2)
    r = refresh_neardup_index(engine.store, index_id="d", **IDX)
    assert r["mode"] == "bootstrap"  # feed pre-images unavailable
    scratch = refresh_neardup_index(engine.store, index_id="s", **IDX)
    pd.testing.assert_frame_equal(
        _sorted_triples(read_index(engine.store, "d")),
        _sorted_triples(read_index(engine.store, "s")),
    )


def test_catalog_query_matches_batch_minhash(ray_session):
    """The rows-only catalog entry's Python oracle: pairs from the
    incremental index probe (epoch-2 docs vs the indexed corpus) must
    equal the from-scratch batch pipeline's pairs restricted to those
    involving an epoch-2 doc — same seeded signatures, same buckets,
    same exact-Jaccard verify, so equality is deterministic."""
    import ray.data as rd

    from arlas_proc_ray.dedup.minhash import minhash_near_duplicates
    from arlas_proc_ray.pipelines.queries import q_incremental_near_dup

    sf = "/root/testdata/sf0.001"
    inc = q_incremental_near_dup(sf)

    ds = rd.read_parquet(
        f"{sf}/documents.parquet", columns=["doc_id", "text"]
    ).filter(expr="doc_id < 300")
    batch = minhash_near_duplicates(
        ds, jaccard_threshold=0.5, algo="classic",
        num_perm=128, bands=32, ngram=5,
    ).to_pandas()
    a = np.minimum(batch["doc_a"], batch["doc_b"])
    b = np.maximum(batch["doc_a"], batch["doc_b"])
    batch = pd.DataFrame({"doc_a": a, "doc_b": b, "jaccard": batch["jaccard"]})
    batch = batch[(batch["doc_a"] >= 150) | (batch["doc_b"] >= 150)]

    exp = {(r.doc_a, r.doc_b): r.jaccard for r in batch.itertuples()}
    got = {(r.doc_a, r.doc_b): r.jaccard for r in inc.itertuples()}
    assert got.keys() == exp.keys()
    assert len(got) > 0
    for k in got:
        assert abs(got[k] - exp[k]) < 1e-12
