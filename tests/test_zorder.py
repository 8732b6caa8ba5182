"""Z-order clustering (stages/zorder.py): interleave parity, global sort
monotonicity, and the locality property the layout exists for."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from arlas_proc_ray.stages.zorder import morton_interleave, with_z_value, zorder_sort


def _py_morton(vals, bits):
    z = 0
    for b in range(bits):
        for i, v in enumerate(vals):
            z |= ((v >> b) & 1) << (len(vals) * b + i)
    return z


def test_interleave_matches_pure_python():
    rng = np.random.default_rng(2)
    x = rng.integers(0, 1 << 16, 500)
    y = rng.integers(0, 1 << 16, 500)
    w = rng.integers(0, 1 << 16, 500)
    for cols in ([x, y], [x, y, w]):
        z = morton_interleave(cols, 16)
        for j in range(0, 500, 37):
            assert z[j] == _py_morton([int(c[j]) for c in cols], 16)


def test_dims_times_bits_overflow_rejected():
    with pytest.raises(ValueError):
        morton_interleave([np.arange(4)] * 4, 16)


def test_zorder_sort_is_globally_monotonic():
    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {"x": rng.integers(0, 1 << 12, 20000), "y": rng.integers(0, 1 << 12, 20000)}
    )
    ds = zorder_sort(rd.from_pandas(df).repartition(8), cols=["x", "y"], bits=12)
    last = None
    for b in ds.iter_batches(batch_format="pandas", batch_size=4096):
        z = b["z_value"].to_numpy()
        assert (np.diff(z) >= 0).all()
        if last is not None:
            assert z[0] >= last
        last = z[-1]


def test_zorder_blocks_are_local_in_both_dims():
    # full 64x64 grid; after z-sort, consecutive chunks must span a SMALL
    # x/y bounding box (z-curve locality), unlike a lexicographic sort
    # where each x-run spans the whole y range.
    n = 64
    xx, yy = np.meshgrid(np.arange(n), np.arange(n))
    df = pd.DataFrame({"x": xx.ravel(), "y": yy.ravel()})
    z = with_z_value(
        rd.from_pandas(df).repartition(4), cols=["x", "y"], bits=6
    ).to_pandas()
    z = z.sort_values("z_value").reset_index(drop=True)
    chunks = np.array_split(z, 16)  # 256 cells each = one 16x16 z-quad
    for c in chunks:
        assert c["x"].max() - c["x"].min() <= 16
        assert c["y"].max() - c["y"].min() <= 16
