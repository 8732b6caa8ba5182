"""Distributed global prefix scan (cumulative aggregates over a TOTAL order).

The per-key ordered operators (stages/keyed.py) cover windows *within* a
key; some pipelines need a running aggregate over the WHOLE dataset in one
global order — e.g. sequence packing for LLM training (assign documents to
fixed-token-budget packs by cumulative token count). Both scans here use
the same range-bucketed two-pass (no global sort, no full
materialization — nothing on this path ever pins O(dataset)):

    1. quantile bucket bounds on the order column (per-block sketch,
       stages/joins.py:range_partition_bounds — every block contributes,
       never a ``limit()`` prefix);
    2. a counting/summing pass: per-batch per-bucket partials →
       driver prefix offsets (``num_partitions`` scalars, never rows);
    3. ONE keyed exchange on the bucket id; inside each partition rows
       sort by the order column and the local cumulative aggregate is
       added to its bucket's offset.

Requires a UNIQUE order column (duplicate order keys would make the
cumulative total at a tied key ambiguous); ids like ``doc_id``/``lsn``
qualify. Order keys travel as float64 in the bucket sketch — exact for
integer magnitudes ≤ 2^53; integer VALUE totals accumulate in int64
end-to-end (exact).
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
    num_partitions: int = 16,
):
    """Inclusive running sum of ``value_col`` over the global ``order_col``
    order (int64 for integer inputs, float64 otherwise). Rows come back
    grouped by order-range bucket and sorted by ``order_col`` within each
    bucket; consumers needing a total presentation order sort the (much
    smaller) result. Same shape as ``global_rank`` — no global sort, no
    ``materialize()`` of the dataset (the round-3 ``.sort().materialize()``
    version pinned O(dataset) in the object store)."""
    import pandas as pd

    from arlas_proc_ray.stages.joins import range_partition_bounds
    from arlas_proc_ray.stages.keyed import keyed_partition_map

    bounds = range_partition_bounds(
        ds.select_columns([order_col]), order_col, num_partitions
    )
    n_buckets = len(bounds) + 1
    sch = ds.schema()
    vtype = dict(zip(sch.names, sch.types))[value_col]
    is_int = (
        pa.types.is_integer(vtype)
        if isinstance(vtype, pa.DataType)
        else np.issubdtype(vtype, np.integer)  # pandas-block schema
    )
    acc_np = np.int64 if is_int else np.float64

    def bucket_of(vals: np.ndarray) -> np.ndarray:
        return np.searchsorted(bounds, vals.astype(np.float64), side="right")

    def sum_partial(batch: pa.Table) -> pa.Table:
        b = bucket_of(batch.column(order_col).to_numpy(zero_copy_only=False))
        v = batch.column(value_col).to_numpy(zero_copy_only=False)
        sums = np.zeros(n_buckets, dtype=acc_np)
        np.add.at(sums, b, v.astype(acc_np))  # exact int64 accumulation
        return pa.table(
            {"bucket": pa.array(np.arange(n_buckets, dtype=np.int64)),
             "s": pa.array(sums)}
        )

    totals = (
        ds.select_columns([order_col, value_col])
        .map_batches(sum_partial, batch_format="pyarrow", batch_size=None)
        .to_pandas()  # n_buckets rows per block — scalars, never row data
        .groupby("bucket")["s"]
        .sum()
        .reindex(range(n_buckets), fill_value=0)
        .to_numpy(acc_np)
    )
    offsets = np.concatenate([[acc_np(0)], np.cumsum(totals)[:-1]])

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = bucket_of(batch.column(order_col).to_numpy(zero_copy_only=False))
        return batch.append_column("_bucket", pa.array(b.astype(np.int64)))

    def scan_partition(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["_bucket", order_col], kind="mergesort")
        local = (
            pdf.groupby("_bucket", sort=False)[value_col]
            .cumsum()
            .to_numpy(acc_np)
        )
        pdf[target] = offsets[pdf["_bucket"].to_numpy(np.int64)] + local
        return pdf.drop(columns=["_bucket"])

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow", batch_size=None)
    return keyed_partition_map(
        bucketed, keys=["_bucket"], order_col=order_col, fn=scan_partition,
        num_partitions=min(num_partitions, n_buckets),
    )


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
