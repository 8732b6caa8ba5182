"""Z-order (Morton) clustering — multi-dimensional locality layout.

The write-layout primitive behind Delta/Iceberg ``OPTIMIZE ZORDER BY``
(public algorithm: Morton 1966 bit interleaving): rows close in EVERY
clustering column land close in the linear order, so range predicates on
any of the columns prune contiguous runs of row groups. The reference's
only layout control is its time partitioner
(transform/WithTimePartition, stages/rowwise.py:79); this generalizes it
to N dimensions.

Scale shape: z-value computation is a stateless vectorized
``map_batches`` (a few dozen numpy bit-ops per batch), and the
clustering itself is Ray Data's range-partitioned ``sort`` — the ONE
all-to-all this op fundamentally requires (it IS a global reorder).
Write the result with ``write_parquet`` and each output file covers a
compact z-range.

SQL parity: the interleave is exact integer math —
``SUM(((x >> b) & 1) << (d*b + i))`` over bits b and dims i — so DuckDB
reproduces every z-value bit-for-bit (see the ``zorder_values`` oracle).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa

Z_COL = "z_value"


def morton_interleave(cols: Sequence[np.ndarray], bits: int) -> np.ndarray:
    """Interleave the low ``bits`` of each int column: bit ``b`` of dim
    ``i`` lands at output bit ``d*b + i``. ``d * bits`` must fit int64
    (≤ 62). Vectorized: one shift/mask/or chain per (bit, dim)."""
    d = len(cols)
    if d * bits > 62:
        raise ValueError(f"{d} dims x {bits} bits overflows int64")
    mask = np.int64((1 << bits) - 1)
    vals = [np.asarray(c, dtype=np.int64) & mask for c in cols]
    z = np.zeros(len(vals[0]), dtype=np.int64)
    for b in range(bits):
        for i, v in enumerate(vals):
            z |= ((v >> np.int64(b)) & np.int64(1)) << np.int64(d * b + i)
    return z


def with_z_value(ds, *, cols: Sequence[str], bits: int = 16, out_col: str = Z_COL):
    """Append the Morton code of ``cols`` (each taken modulo 2^bits —
    pre-quantize floats/wide ranges upstream) as ``out_col``."""
    cols = list(cols)

    def add_z(batch: pa.Table) -> pa.Table:
        arrs = [
            batch.column(c).to_numpy(zero_copy_only=False) for c in cols
        ]
        z = morton_interleave(arrs, bits)
        return batch.append_column(out_col, pa.array(z, type=pa.int64()))

    return ds.map_batches(add_z, batch_format="pyarrow", batch_size=None)


def zorder_sort(ds, *, cols: Sequence[str], bits: int = 16):
    """Cluster the dataset by the Morton code of ``cols``: the z-value
    map is embarrassingly parallel, the sort is Ray's range-partitioned
    shuffle. Downstream ``write_parquet`` yields files whose z-ranges —
    and therefore per-column min/max ranges — are compact."""
    return with_z_value(ds, cols=cols, bits=bits).sort(Z_COL)
