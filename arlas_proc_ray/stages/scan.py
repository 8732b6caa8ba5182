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


def global_rank(
    ds,
    *,
    order_cols,
    target: str = "rnk",
    num_partitions: int = 16,
):
    """Exact global ``row_number() OVER (ORDER BY order_cols…)`` without a
    global sort barrier on the driver.

    Classic two-pass range-partitioned rank:

      1. quantile bounds on the first order column (per-block sketch,
         stages/joins.py:range_partition_bounds — covers the whole domain
         even on pre-sorted input);
      2. a counting pass: per-batch bucket bincount partials → driver
         prefix offsets (``num_partitions`` integers, never rows);
      3. ONE keyed exchange on the bucket id; inside each partition rows
         are sorted by the full ``order_cols`` tie-break chain and ranked
         as offset[bucket] + local position.

    Rows equal on the first order column always share a bucket (bounds
    are unique values), so cross-bucket tie-breaks cannot split.
    """
    import pandas as pd

    from arlas_proc_ray.stages.joins import range_partition_bounds
    from arlas_proc_ray.stages.keyed import keyed_partition_map

    order_cols = list(order_cols)
    first = order_cols[0]
    bounds = range_partition_bounds(ds, first, num_partitions)
    n_buckets = len(bounds) + 1

    def bucket_of(vals: np.ndarray) -> np.ndarray:
        return np.searchsorted(bounds, vals.astype(np.float64), side="right")

    def count_partial(batch: pa.Table) -> pa.Table:
        b = bucket_of(batch.column(first).to_numpy(zero_copy_only=False))
        counts = np.bincount(b, minlength=n_buckets)
        return pa.table(
            {"bucket": pa.array(np.arange(n_buckets, dtype=np.int64)),
             "n": pa.array(counts.astype(np.int64))}
        )

    counts = (
        ds.select_columns([first])
        .map_batches(count_partial, batch_format="pyarrow", batch_size=None)
        .to_pandas()
        .groupby("bucket")["n"]
        .sum()
        .reindex(range(n_buckets), fill_value=0)
        .to_numpy(np.int64)
    )
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = bucket_of(batch.column(first).to_numpy(zero_copy_only=False))
        return batch.append_column("_bucket", pa.array(b.astype(np.int64)))

    def rank_partition(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["_bucket"] + order_cols, kind="mergesort")
        local = pdf.groupby("_bucket", sort=False).cumcount().to_numpy(np.int64)
        pdf[target] = offsets[pdf["_bucket"].to_numpy(np.int64)] + local + 1
        return pdf.drop(columns=["_bucket"])

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow", batch_size=None)
    return keyed_partition_map(
        bucketed, keys=["_bucket"], order_col=first, fn=rank_partition,
        num_partitions=min(num_partitions, n_buckets),
    )
