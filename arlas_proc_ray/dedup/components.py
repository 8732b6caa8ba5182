"""Duplicate-cluster assignment: connected components over dup pairs.

After MinHash-LSH verification produces (doc_a, doc_b) edges, documents
must be grouped into clusters so one canonical representative survives.
Components are computed by iterative min-label propagation expressed as
Ray Data groupbys (scales to edge sets that don't fit the driver); when the
edge set is provably small it short-circuits to a driver-side union-find.

Label propagation round (all vectorized pandas inside hash partitions):
  labels(node) = min(label(node), min over neighbors' labels)
repeated until no label changes — O(diameter) rounds, and near-dup
clusters have tiny diameters in practice.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from arlas_proc_ray.stages.keyed import keyed_partition_map


def _union_find(edges: pd.DataFrame) -> pd.DataFrame:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(edges["doc_a"], edges["doc_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    rows = [(n, find(n)) for n in parent]
    return pd.DataFrame(rows, columns=["doc_id", "cluster_id"]).sort_values(
        "doc_id"
    ).reset_index(drop=True)


def connected_components(
    pairs_ds,
    *,
    driver_threshold: int = 1_000_000,
    max_rounds: int = 50,
    num_partitions: int = 16,
):
    """(doc_a, doc_b) edge Dataset → (doc_id, cluster_id) assignment.

    cluster_id = the smallest doc_id in the component (deterministic).
    """
    n_edges = pairs_ds.count()
    if n_edges == 0:
        return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                             "cluster_id": pd.Series([], dtype=np.int64)})
    if n_edges <= driver_threshold:
        edges = pairs_ds.select_columns(["doc_a", "doc_b"]).to_pandas()
        return _union_find(edges)

    # distributed min-label propagation
    import ray.data as rd

    edges = pairs_ds.select_columns(["doc_a", "doc_b"])

    def init_labels(pdf: pd.DataFrame) -> pd.DataFrame:
        nodes = np.unique(np.concatenate([pdf["doc_a"], pdf["doc_b"]]))
        return pd.DataFrame({"doc_id": nodes, "cluster_id": nodes})

    labels = keyed_partition_map(
        edges, keys=["doc_a"], order_col="doc_b", fn=init_labels,
        num_partitions=num_partitions,
    )
    labels = keyed_partition_map(
        labels, keys=["doc_id"], order_col="cluster_id",
        fn=lambda pdf: pdf.drop_duplicates("doc_id"),
        num_partitions=num_partitions,
    ).materialize()

    for _ in range(max_rounds):
        lab_pdf = labels.to_pandas()  # (compact: one row per node)

        def propagate(pdf: pd.DataFrame, lab=lab_pdf) -> pd.DataFrame:
            m = lab.set_index("doc_id")["cluster_id"]
            la = pdf["doc_a"].map(m)
            lb = pdf["doc_b"].map(m)
            lo = np.minimum(la, lb)
            return pd.DataFrame(
                {"doc_id": np.concatenate([pdf["doc_a"], pdf["doc_b"]]),
                 "cluster_id": np.concatenate([lo, lo])}
            )

        new_labels = keyed_partition_map(
            edges.map_batches(propagate, batch_format="pandas"),
            keys=["doc_id"],
            order_col="cluster_id",
            fn=lambda pdf: pdf.groupby("doc_id", as_index=False)["cluster_id"].min(),
            num_partitions=num_partitions,
        ).materialize()
        new_pdf = new_labels.to_pandas().sort_values("doc_id").reset_index(drop=True)
        old_pdf = lab_pdf.sort_values("doc_id").reset_index(drop=True)
        if len(new_pdf) == len(old_pdf) and (
            new_pdf["cluster_id"].values == old_pdf["cluster_id"].values
        ).all():
            return new_pdf
        labels = new_labels
    return labels.to_pandas().sort_values("doc_id").reset_index(drop=True)
