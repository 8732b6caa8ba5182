"""Exact content deduplication: hash → partition → keep-first.

Same primitive as the reference's (id, timestamp) dedup
(tools/DataFrameFormatter.scala:48) and the CDC LWW reduce, applied to
document content: the shuffle key is the 256-bit content hash, the winner
per group is the smallest id (deterministic).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from arlas_proc_ray.functions.hashing import sha256_hex
from arlas_proc_ray.stages.keyed import keyed_partition_map


def with_text_sha256(ds, text_col: str = "text", target: str = "text_sha256"):
    def add_hash(batch: pa.Table) -> pa.Table:
        return batch.append_column(target, sha256_hex(batch.column(text_col)))

    return ds.map_batches(add_hash, batch_format="pyarrow", batch_size=None)


def exact_dedup(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 64,
    keep_cols: list[str] | None = None,
):
    """One surviving row per distinct content, winner = min(id_col).

    Vectorized per partition: pandas ``drop_duplicates`` over the hash after
    an in-partition sort by (hash, id).
    """
    ds = with_text_sha256(ds, text_col)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf.drop_duplicates(subset=["text_sha256"], keep="first")
        return out[keep_cols] if keep_cols else out

    return keyed_partition_map(
        ds,
        keys=["text_sha256"],
        order_col=id_col,
        fn=fn,
        num_partitions=num_partitions,
    )
