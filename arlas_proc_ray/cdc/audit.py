"""Changelog audit — per-key stream-quality metrics.

The operational health check in front of the ingest engine: how
out-of-order is delivery, are LSNs unique, where are the sequence gaps.
The engine tolerates all three (LWW by lsn + manifest fences), but at
100 TB you alert on the RATE — a spike in gaps or inversions upstream
is how a lost Kafka partition or a misbehaving producer shows up.

One keyed exchange; inside the partition every metric is a vectorized
pandas groupby across all keys (shift for adjacent inversions, nunique
for duplicates/gaps). Output is one row per key — tiny.
"""

from __future__ import annotations

import pandas as pd

from arlas_proc_ray.stages.keyed import keyed_partition_map


def changelog_audit(
    ds,
    *,
    key_col: str,
    lsn_col: str,
    delivery_order_col: str,
    num_partitions: int = 64,
):
    """Per-key metrics: event count, adjacent out-of-order deliveries
    (previous LSN in delivery order greater than the next), duplicate
    LSNs, and interior LSN sequence gaps. Delivery order is
    (``delivery_order_col``, ``lsn_col``) — LSN tie-break so the
    inversion count is deterministic under equal delivery stamps."""

    def part(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            [key_col, delivery_order_col, lsn_col], kind="mergesort"
        )
        g = pdf.groupby(key_col, sort=False)
        prev = g[lsn_col].shift()
        inv = (
            (prev > pdf[lsn_col])
            .groupby(pdf[key_col], sort=False)
            .sum()
            .astype("int64")
        )
        agg = g[lsn_col].agg(["size", "min", "max", "nunique"])
        out = pd.DataFrame(
            {
                "n_events": agg["size"].astype("int64"),
                "n_ooo": inv,
                "lsn_min": agg["min"].astype("int64"),
                "lsn_max": agg["max"].astype("int64"),
                "n_dup_lsn": (agg["size"] - agg["nunique"]).astype("int64"),
                "lsn_gaps": (
                    agg["max"] - agg["min"] + 1 - agg["nunique"]
                ).astype("int64"),
            }
        )
        return out.reset_index()

    return keyed_partition_map(
        ds,
        keys=[key_col],
        order_col=delivery_order_col,
        fn=part,
        num_partitions=num_partitions,
    )
