"""Property tests for the table services: clustering and DLQ splitting.

Both are pure functions of their inputs (no Ray needed): clustering must
never change WHAT a scan returns, only the physical layout; the dead-letter
split must exactly partition every batch into valid + quarantined rows.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

from arlas_proc_ray.cdc.snapshot import (
    SnapshotStore,
    _stats_may_match,
    row_group_pruning_stats,
)


def _table(rng, n):
    return pa.table(
        {
            "repo": pa.array([f"r{rng.integers(0, 5)}" for _ in range(n)]),
            "path": pa.array([f"p{rng.integers(0, 50)}" for _ in range(n)]),
            "v": pa.array(rng.integers(-100, 100, n), pa.int64()),
            "content_sha256": pa.array([f"{i:064x}" for i in range(n)]),
            "last_lsn": pa.array(np.arange(n, dtype=np.int64)),
        }
    )


@settings(max_examples=20, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    n=st.integers(1, 400),
    rg=st.integers(7, 64),
    lo=st.integers(-100, 100),
    width=st.integers(0, 60),
)
def test_clustered_scan_logical_parity(tmp_path_factory, seed, n, rg, lo, width):
    """For ANY table and range predicate: clustered file returns the same
    rows, the same manifest rollup, and prunes conservatively (every
    pruned row group really contains no matching row)."""
    rng = np.random.default_rng(seed)
    t = _table(rng, n)
    d = tmp_path_factory.mktemp("prop")
    plain = SnapshotStore(str(d / "plain"), row_group_rows=rg)
    clus = SnapshotStore(str(d / "clus"), cluster_by=["v"], row_group_rows=rg)
    mp = plain.write_partition(1, 0, t, last_lsn=n)
    mc = clus.write_partition(1, 0, t, last_lsn=n)
    assert mc.sha256_rollup == mp.sha256_rollup
    assert mc.col_stats == mp.col_stats

    pred = [("v", ">=", lo), ("v", "<=", lo + width)]
    exp = t.to_pandas().query(f"v >= {lo} and v <= {lo + width}")
    for store in (plain, clus):
        f = store.part_data_path(1, 0)
        # conservative row-group pruning: re-read only the matching groups
        stats = row_group_pruning_stats([f], pred)
        pf = pq.ParquetFile(f)
        kept_rows = 0
        for g in range(pf.metadata.num_row_groups):
            rgm = pf.metadata.row_group(g)
            st_ = {}
            for ci in range(rgm.num_columns):
                c = rgm.column(ci)
                if c.statistics is not None and c.statistics.has_min_max:
                    st_[c.path_in_schema] = [c.statistics.min, c.statistics.max]
            grp = pf.read_row_group(g).to_pandas()
            matching = grp.query(f"v >= {lo} and v <= {lo + width}")
            if _stats_may_match(st_, pred):
                kept_rows += len(matching)
            else:
                assert len(matching) == 0, "pruned a row group with matches"
        assert kept_rows == len(exp)
        assert stats["rows_matching"] >= len(exp)


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    n=st.integers(1, 200),
    p_bad=st.floats(0.0, 0.9),
)
def test_dead_letter_split_partitions_batch(tmp_path_factory, seed, n, p_bad):
    """Quarantined + surviving rows exactly partition the input; each
    quarantined row carries the first-matching reason."""
    from arlas_proc_ray.cdc.events import default_registry
    from arlas_proc_ray.cdc.replay import make_dead_letter_fn, read_dead_letters
    from arlas_proc_ray.model import DataModel

    rng = np.random.default_rng(seed)
    reg = default_registry()
    versions = reg.versions()
    sv = rng.choice(versions + [9], n, p=None)
    ops = rng.choice(["INSERT", "UPDATE", "DELETE", "FROB"], n)
    lsn = rng.integers(0, 10_000, n).astype(object)
    path = np.array([f"p{i}" for i in range(n)], dtype=object)
    bad_lsn = rng.random(n) < p_bad / 3
    bad_path = rng.random(n) < p_bad / 3
    lsn[bad_lsn] = None
    path[bad_path] = None

    batch = pa.table(
        {
            "lsn": pa.array(lsn.tolist(), pa.int64()),
            "op": pa.array(ops.tolist(), pa.string()),
            "repo": pa.array([f"r{i % 7}" for i in range(n)]),
            "path": pa.array(path.tolist(), pa.string()),
            "commit": pa.array(["c"] * n),
            "language": pa.array(["py"] * n),
            "content": pa.array(["x"] * n),
            "content_size": pa.array([1] * n, pa.int64()),
            "schema_version": pa.array(sv.astype(int).tolist(), pa.int32()),
            "delivery_index": pa.array(list(range(n)), pa.int64()),
        }
    )
    d = tmp_path_factory.mktemp("dlq")
    fn = make_dead_letter_fn(reg, DataModel(num_partitions=4), str(d), 7)
    out = fn(batch)
    dl = read_dead_letters(str(d))

    is_bad_sv = ~np.isin(sv, versions)
    is_bad_op = ops == "FROB"
    expect_bad = is_bad_sv | is_bad_op | bad_lsn | bad_path
    assert out.num_rows + dl.num_rows == n
    assert dl.num_rows == int(expect_bad.sum())
    # reason precedence: version, then op, then order, then key
    if dl.num_rows:
        reasons = dict(
            zip(dl.column("delivery_index").to_pylist(),
                dl.column("dlq_reason").to_pylist())
        )
        for i in np.flatnonzero(expect_bad):
            want = (
                "unknown_schema_version" if is_bad_sv[i]
                else "invalid_op" if is_bad_op[i]
                else "null_order" if bad_lsn[i]
                else "null_key:path"
            )
            assert reasons[int(i)] == want
    # surviving rows came out aligned to the canonical schema
    assert "content_size" in out.column_names
