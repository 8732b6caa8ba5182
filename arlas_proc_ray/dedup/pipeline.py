"""End-to-end corpus deduplication: exact + near-dup + cluster survivors.

The composition a training-data curation run actually uses:

  docs ──exact sha256 dedup──▶ unique-content docs
       ──MinHash-LSH──▶ verified near-dup pairs
       ──connected components──▶ (doc_id, cluster_id)
       ──survivor selection──▶ keep min(doc_id) per cluster; everything
                               never seen in a pair survives untouched

Returns the surviving documents plus a ``dup_cluster_id`` column (null for
documents with no near-duplicates) and drop statistics.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray

from arlas_proc_ray.dedup.components import connected_components
from arlas_proc_ray.dedup.exact import with_text_sha256
from arlas_proc_ray.dedup.minhash import minhash_near_duplicates
from arlas_proc_ray.stages.keyed import keyed_partition_map


def dedup_documents(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.8,
    num_partitions: int = 16,
    concurrency: int = 2,
):
    """Deduplicate a document Dataset; returns (survivors_ds, stats dict).

    Exact phase drops byte-identical content (winner = min id); near-dup
    phase clusters the remainder and keeps one representative per cluster.
    """
    n_input = ds.count()

    hashed = with_text_sha256(ds, text_col)
    exact_unique = keyed_partition_map(
        hashed,
        keys=["text_sha256"],
        order_col=id_col,
        fn=lambda pdf: pdf.drop_duplicates(subset=["text_sha256"], keep="first"),
        num_partitions=num_partitions,
    ).materialize()
    n_exact = exact_unique.count()

    pairs = minhash_near_duplicates(
        exact_unique.drop_columns(["text_sha256"]),
        text_col=text_col,
        id_col=id_col,
        jaccard_threshold=jaccard_threshold,
        concurrency=concurrency,
    )
    labels = connected_components(pairs, num_partitions=num_partitions)
    # losers: cluster members that are not their cluster's representative
    losers = (
        set(labels.loc[labels["doc_id"] != labels["cluster_id"], "doc_id"])
        if len(labels)
        else set()
    )
    cluster_of = dict(zip(labels["doc_id"], labels["cluster_id"]))
    losers_ref = ray.put(losers)
    clusters_ref = ray.put(cluster_of)

    def keep_survivors(pdf: pd.DataFrame) -> pd.DataFrame:
        drop = ray.get(losers_ref)
        cmap = ray.get(clusters_ref)
        out = pdf[~pdf[id_col].isin(drop)].copy()
        out["dup_cluster_id"] = out[id_col].map(cmap).astype("Int64")
        return out

    survivors = exact_unique.map_batches(keep_survivors, batch_format="pandas")
    stats = {
        "input_docs": n_input,
        "after_exact": n_exact,
        "near_dup_losers": len(losers),
        "clusters": int(len(set(cluster_of.values()))) if cluster_of else 0,
    }
    return survivors, stats
