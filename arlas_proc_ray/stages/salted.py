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

from arlas_proc_ray.stages.keyed import keyed_partition_map


def salted_aggregate(
    ds,
    *,
    keys: Sequence[str],
    partial_fn: Callable[[pd.DataFrame], pd.DataFrame],
    merge_fn: Callable[[pd.DataFrame], pd.DataFrame],
    salt: int = 8,
    num_partitions: int = 64,
    order_col: str | None = None,
):
    """Two-phase aggregation with hot keys split across ``salt`` reducers.

    ``partial_fn(pdf)``: reduce rows of one (key, salt) slice → partial rows
    (must include the key columns).
    ``merge_fn(pdf)``: merge the ≤``salt`` partials of one key → final rows.
    """
    keys = list(keys)
    salt_col = "_salt"

    def add_salt(batch: pa.Table) -> pa.Table:
        # deterministic per-row salt (row position hash) — spreads a hot
        # key's rows uniformly without any key-frequency pre-pass
        n = batch.num_rows
        salts = (np.arange(n, dtype=np.int64) * 2654435761 % salt).astype(np.int32)
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
