"""Explicit skew handling: two-phase salted aggregation.

The reference leaves skew unhandled (one hot object id = one giant Spark
partition — SURVEY.md §4). Here hot keys are handled two ways:

1. **Associative reductions** (LWW upsert, sum/min/max/count sketches):
   the per-batch combiner in the map stage already collapses a hot key
   inside every upstream block, so at most (#blocks) rows per key reach the
   shuffle — no salting needed. This is the CDC replay path.

2. **Non-combinable aggregations** over a hot key (e.g. exact distinct
   collection, large per-key reduce) use THIS module: phase 1 shuffles on
   ``(key, salt)`` where ``salt = hash(row) % k`` splits each key across k
   reducers; phase 2 re-reduces the k partials per key. Correct only for
   aggregations expressible as merge(partial, partial) — the caller
   provides both phases.

Per-key ORDER-SENSITIVE operators (lag/lead/segmenting) can never split a
key; their skew bound is "one key's rows must fit one partition", which is
the documented partitioning assumption of ``keyed_partition_map``.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

from arlas_proc_ray.stages.keyed import (
    byte_exact_group_cols,
    keyed_partition_map,
    restore_object_cols,
)


def detect_hot_keys(
    ds,
    keys: Sequence[str],
    *,
    min_fraction: float = 0.01,
) -> pd.DataFrame:
    """Distributed hot-key detection with NO false negatives.

    Two cheap passes, nothing key-cardinality-sized ever reaches the
    driver:

    1. candidate scan: each batch emits only the keys holding ≥
       ``min_fraction/2`` of ITS rows. Pigeonhole guarantee: a key with
       global share ≥ f must hold share ≥ f/2 in at least one batch
       (otherwise its total would be < f/2 · N) — so the candidate set
       (bounded by 2·#batches/f rows, key-cardinality-free) cannot miss
       a truly hot key.
    2. exact recount: candidate keys are broadcast and counted exactly
       per batch; partial counts sum on the driver (tiny) and keys with
       global share ≥ ``min_fraction`` survive.

    Returns a DataFrame of the key columns + ``count``.
    """
    import ray

    keys = list(keys)
    n_total = ds.count()
    if n_total == 0:
        return pd.DataFrame({**{k: [] for k in keys}, "count": []})
    half = min_fraction / 2.0

    def candidates(pdf: pd.DataFrame) -> pd.DataFrame:
        vc = byte_exact_group_cols(pdf, keys).groupby(keys, sort=False).size()
        hot = vc[vc >= max(1.0, half * len(pdf))]
        return restore_object_cols(hot.reset_index(name="count")[keys], keys)

    cand = (
        ds.map_batches(candidates, batch_format="pandas", batch_size=None)
        .to_pandas()
        .drop_duplicates(keys)
    )
    if cand.empty:
        return pd.DataFrame({**{k: [] for k in keys}, "count": []})
    from arlas_proc_ray.stages.lookup import key_isin, make_key_index

    cand_ref = ray.put(make_key_index(cand, keys))

    def recount(pdf: pd.DataFrame) -> pd.DataFrame:
        mask = key_isin(pdf, keys, ray.get(cand_ref))
        vc = byte_exact_group_cols(pdf[mask].copy(), keys).groupby(
            keys, sort=False
        ).size()
        return restore_object_cols(vc.reset_index(name="count"), keys)

    counts = ds.map_batches(recount, batch_format="pandas", batch_size=None).to_pandas()
    if counts.empty:
        return pd.DataFrame({**{k: [] for k in keys}, "count": []})
    total = counts.groupby(keys, as_index=False)["count"].sum()
    return total[total["count"] >= min_fraction * n_total].reset_index(drop=True)


def salted_aggregate(
    ds,
    *,
    keys: Sequence[str],
    partial_fn: Callable[[pd.DataFrame], pd.DataFrame],
    merge_fn: Callable[[pd.DataFrame], pd.DataFrame],
    salt: int = 8,
    num_partitions: int = 64,
    order_col: str | None = None,
    hot_keys: pd.DataFrame | str | None = None,
    hot_fraction: float = 0.01,
):
    """Two-phase aggregation with hot keys split across ``salt`` reducers.

    ``partial_fn(pdf)``: reduce rows of one (key, salt) slice → partial rows
    (must include the key columns).
    ``merge_fn(pdf)``: merge the ≤``salt`` partials of one key → final rows.

    ``hot_keys``: None → salt EVERY key (static, the round-1 behavior);
    ``"auto"`` → run ``detect_hot_keys`` (share ≥ ``hot_fraction``) and
    salt ONLY those — the cold majority keeps salt 0, so their partials
    are not split ``salt`` ways and the merge phase shrinks ~salt× ; a
    DataFrame of key columns → use those as the hot set directly.
    """
    import ray

    keys = list(keys)
    salt_col = "_salt"

    from arlas_proc_ray.stages.lookup import key_isin, make_key_index

    if isinstance(hot_keys, str) and hot_keys == "auto":
        hot_keys = detect_hot_keys(ds, keys, min_fraction=hot_fraction)
    hot_ref = (
        ray.put(make_key_index(hot_keys, keys)) if hot_keys is not None else None
    )

    def add_salt(batch: pa.Table) -> pa.Table:
        # deterministic per-row salt (row position hash) — spreads a hot
        # key's rows uniformly
        n = batch.num_rows
        salts = (np.arange(n, dtype=np.int64) * 2654435761 % salt).astype(np.int32)
        if hot_ref is not None:
            pdf = batch.select(keys).to_pandas()
            is_hot = np.asarray(key_isin(pdf, keys, ray.get(hot_ref)))
            salts = np.where(is_hot, salts, 0).astype(np.int32)
        return batch.append_column(salt_col, pa.array(salts))

    salted = ds.map_batches(add_salt, batch_format="pyarrow", batch_size=None)

    phase1 = keyed_partition_map(
        salted,
        keys=keys + [salt_col],
        order_col=order_col or salt_col,
        fn=lambda pdf: partial_fn(pdf).reset_index(drop=True),
        num_partitions=num_partitions,
    )

    def merge_wrapper(pdf: pd.DataFrame) -> pd.DataFrame:
        if salt_col in pdf.columns:
            pdf = pdf.drop(columns=[salt_col])
        return merge_fn(pdf).reset_index(drop=True)

    # merge phase needs no intra-key order — sort key is the key itself
    return keyed_partition_map(
        phase1,
        keys=keys,
        order_col=keys[0],
        fn=merge_wrapper,
        num_partitions=max(8, num_partitions // 4),
    )
