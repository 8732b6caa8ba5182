"""Distributed inversion counter vs the exact local merge counter.

The decomposition (count-matrix cross pairs + per-chunk locals +
per-bucket cross-chunk remainders, stages/inversions.py) must equal the
level-vectorized local counter on every input — permutations, ties in y,
skewed value ranges, tiny/empty inputs, and a 10⁶-row sequence that
evidences the event-scale path the kendall cardinality contract names.
"""

import numpy as np
import pandas as pd
import ray.data as rd

from arlas_proc_ray.stages.inversions import (
    count_inversions,
    distributed_inversion_count,
)


def _dic(df: pd.DataFrame, blocks: int = 5, **kw) -> int:
    ds = rd.from_pandas(df).repartition(blocks)
    kw.setdefault("num_chunks", 4)
    kw.setdefault("num_buckets", 4)
    kw.setdefault("num_partitions", 4)
    return distributed_inversion_count(ds, x_col="x", y_col="y", **kw)


def test_random_permutations_match_local():
    rng = np.random.default_rng(7)
    for n in (2, 3, 5, 17, 64, 101, 500):
        x = rng.permutation(n).astype(np.int64)
        y = rng.permutation(n).astype(np.int64)
        df = pd.DataFrame({"x": x, "y": y})
        order = np.argsort(x)
        want = count_inversions(y[order])
        assert _dic(df) == want


def test_ties_in_y_are_not_inversions():
    rng = np.random.default_rng(11)
    n = 300
    x = rng.permutation(n).astype(np.int64)
    y = rng.integers(0, 7, n).astype(np.int64)  # heavy ties
    df = pd.DataFrame({"x": x, "y": y})
    order = np.argsort(x)
    want = count_inversions(y[order])
    assert _dic(df) == want
    # brute-force double check on a slice the O(n²) check can afford
    sl = df.iloc[:120].reset_index(drop=True)
    o = np.argsort(sl["x"].to_numpy())
    ys = sl["y"].to_numpy()[o]
    brute = sum(
        int(ys[i] > ys[j]) for i in range(len(ys)) for j in range(i + 1, len(ys))
    )
    assert _dic(sl) == brute


def test_extremes_and_tiny():
    n = 256
    asc = pd.DataFrame(
        {"x": np.arange(n, dtype=np.int64), "y": np.arange(n, dtype=np.int64)}
    )
    dsc = pd.DataFrame(
        {"x": np.arange(n, dtype=np.int64), "y": np.arange(n, dtype=np.int64)[::-1]}
    )
    assert _dic(asc) == 0
    assert _dic(dsc) == n * (n - 1) // 2
    assert _dic(asc.iloc[:1]) == 0
    assert _dic(asc.iloc[:0]) == 0


def test_skewed_sparse_value_ranges():
    # x/y values far apart → most chunks/buckets empty; count must hold
    rng = np.random.default_rng(3)
    n = 400
    x = (rng.permutation(n).astype(np.int64) * 1_000_003) - 77
    y = (rng.permutation(n).astype(np.int64) * 999_983) + 12_345
    df = pd.DataFrame({"x": x, "y": y})
    order = np.argsort(x)
    want = count_inversions(y[order])
    assert _dic(df, num_chunks=7, num_buckets=3) == want


def test_chunk_bucket_counts_do_not_matter():
    rng = np.random.default_rng(19)
    n = 513  # odd, not a multiple of any bin count
    x = rng.permutation(n).astype(np.int64)
    y = rng.permutation(n).astype(np.int64)
    df = pd.DataFrame({"x": x, "y": y})
    order = np.argsort(x)
    want = count_inversions(y[order])
    for cb in ((1, 1), (2, 9), (16, 16), (64, 5)):
        assert _dic(df, num_chunks=cb[0], num_buckets=cb[1]) == want


def test_event_scale_million_rows():
    """The contract case: a sequence too big to WANT on the driver."""
    rng = np.random.default_rng(42)
    n = 1_000_000
    x = rng.permutation(n).astype(np.int64)
    y = rng.permutation(n).astype(np.int64)
    df = pd.DataFrame({"x": x, "y": y})
    order = np.argsort(x)
    want = count_inversions(y[order])
    got = _dic(df, blocks=16, num_chunks=16, num_buckets=16,
               num_partitions=8)
    assert got == want


def test_kendall_twin_matches_driver_side():
    import __ray_entry__ as entry

    qs = entry.queries()
    a = qs["kendall_spend_activity"]("/root/testdata/sf0.001")
    b = qs["kendall_distributed"]("/root/testdata/sf0.001")
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )
