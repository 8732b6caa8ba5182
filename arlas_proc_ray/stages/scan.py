"""Distributed global prefix scan (cumulative aggregates over a TOTAL order).

The per-key ordered operators (stages/keyed.py) cover windows *within* a
key; some pipelines need a running aggregate over the WHOLE dataset in one
global order — e.g. sequence packing for LLM training (assign documents to
fixed-token-budget packs by cumulative token count). The classic two-pass
scan:

    1. global sort on the order column (Ray's range-partitioned sort);
    2. one tiny pass collecting per-block (first_key, block_total) —
       O(#blocks) rows on the driver, never row data;
    3. exclusive scan of the block totals on the driver → per-block
       offsets, broadcast via closure (an O(#blocks) array);
    4. per-block vectorized cumsum + its offset.

Requires a UNIQUE order column (ties across a block boundary would make
the block-offset lookup ambiguous); ids like ``doc_id``/``lsn`` qualify.
Order keys and block totals travel as float64 in the tiny block-meta
table — exact for integer magnitudes ≤ 2^53 (int64 ids near the full 63
bits would need a widened meta path).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def global_cumsum(
    ds,
    *,
    order_col: str,
    value_col: str,
    target: str = "cumsum",
):
    """Inclusive running sum of ``value_col`` over the global ``order_col``
    order. Returns the dataset sorted by ``order_col`` with ``target``
    appended (int64 for integer inputs, float64 otherwise)."""
    sorted_ds = ds.sort(order_col).materialize()

    def block_meta(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"first": pa.array([], pa.float64()), "total": pa.array([], pa.float64())}
            )
        first = pc.cast(batch.column(order_col)[0], pa.float64())
        total = pc.cast(pc.sum(batch.column(value_col)), pa.float64())
        return pa.table({"first": pa.array([first.as_py()]), "total": pa.array([total.as_py()])})

    meta = (
        sorted_ds.map_batches(block_meta, batch_format="pyarrow", batch_size=None)
        .to_pandas()
        .sort_values("first")
    )
    bounds = meta["first"].to_numpy(np.float64)
    offsets = np.concatenate([[0.0], np.cumsum(meta["total"].to_numpy())[:-1]])

    def add_scan(batch: pa.Table) -> pa.Table:
        vals = batch.column(value_col)
        is_int = pa.types.is_integer(vals.type)
        out_type = pa.int64() if is_int else pa.float64()
        if batch.num_rows == 0:
            return batch.append_column(target, pa.array([], out_type))
        first = float(pc.cast(batch.column(order_col)[0], pa.float64()).as_py())
        i = int(np.searchsorted(bounds, first, side="right")) - 1
        off = offsets[max(i, 0)]
        v = vals.to_numpy(zero_copy_only=False)
        cs = np.cumsum(v.astype(np.int64 if is_int else np.float64))
        cs = cs + (np.int64(round(off)) if is_int else off)
        return batch.append_column(target, pa.array(cs, out_type))

    return sorted_ds.map_batches(add_scan, batch_format="pyarrow", batch_size=None)


def sequence_packing(
    ds,
    *,
    order_col: str,
    size_col: str,
    capacity: int,
    pack_col: str = "pack_id",
    cum_col: str = "cum_size",
):
    """Assign rows (documents) to fixed-capacity packs by cumulative size.

    Contract (shared with the SQL oracle): rows are taken in ``order_col``
    order; ``pack_id = (inclusive_cumsum − size) // capacity`` — i.e. a
    row starts in the pack its PRECEDING total falls in (sequential fill;
    a row may straddle its pack boundary, the consumer decides whether to
    split or spill — the deterministic assignment is what matters for
    reproducible training shards).
    """
    scanned = global_cumsum(
        ds, order_col=order_col, value_col=size_col, target=cum_col
    )

    def assign(batch: pa.Table) -> pa.Table:
        cum = batch.column(cum_col).to_numpy(zero_copy_only=False)
        size = batch.column(size_col).to_numpy(zero_copy_only=False)
        pack = ((cum - size) // capacity).astype(np.int64)
        return batch.append_column(pack_col, pa.array(pack, pa.int64()))

    return scanned.map_batches(assign, batch_format="pyarrow", batch_size=None)
