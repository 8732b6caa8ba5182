"""Duplicate-cluster assignment: connected components over dup pairs.

After MinHash-LSH verification produces (doc_a, doc_b) edges, documents
must be grouped into clusters so one canonical representative survives.
Components are computed by iterative min-label propagation expressed as
co-partitioned Ray Data passes — labels live in a DATASET the whole time
(never the driver; round-1 verdict item 3). When the edge set is provably
small it short-circuits to a driver-side union-find.

One round = three keyed passes (each ONE hash shuffle):

  1. offers:   union(edges in BOTH orientations, labels) keyed on the
               source node → every neighbor receives the node's label
  2. reduce:   union(offers, current labels) keyed on doc_id →
               label'(n) = min({label(n)} ∪ offers(n))
  3. shortcut: labels ⋈ labels (pointer doubling) →
               label''(n) = min(label'(n), label'(label'(n)))

repeated until the distributed ``changed`` counts (scalar sums — the only
thing that ever reaches the driver) are zero. The doubling pass halves
every label chain per round, so convergence is O(log diameter) rounds
rather than O(diameter) — the difference between ~7 and ~10⁶ rounds on a
pathological chain-shaped component. Edges are materialized ONCE up front
(they are the dup-pair list, far smaller than the corpus, and live in the
object store, not the driver); labels are re-materialized per round.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

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


_EMPTY_LABELS = {
    "doc_id": pd.Series([], dtype=np.int64),
    "cluster_id": pd.Series([], dtype=np.int64),
}


def _empty_changed() -> pd.DataFrame:
    return pd.DataFrame({**_EMPTY_LABELS, "changed": pd.Series([], dtype=np.int8)})


def _i64(col: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray:
    return pa.compute.cast(col, pa.int64())


def connected_components_ds(
    pairs_ds,
    *,
    driver_threshold: int = 1_000_000,
    max_rounds: int = 50,
    num_partitions: int = 16,
):
    """(doc_a, doc_b) edge Dataset → (doc_id, cluster_id) Dataset.

    cluster_id = the smallest doc_id in the component (deterministic).
    The result has one row per node that appears in any edge; its size is
    bounded by the dup-document count, and it stays distributed.
    """
    import ray.data as rd

    n_edges = pairs_ds.count()
    if n_edges == 0:
        return rd.from_pandas(pd.DataFrame(_EMPTY_LABELS))
    if n_edges <= driver_threshold:
        edges = pairs_ds.select_columns(["doc_a", "doc_b"]).to_pandas()
        return rd.from_pandas(_union_find(edges))

    edges = pairs_ds.select_columns(["doc_a", "doc_b"]).materialize()

    def init_labels(pdf: pd.DataFrame) -> pd.DataFrame:
        nodes = np.unique(np.concatenate([pdf["doc_a"], pdf["doc_b"]]))
        return pd.DataFrame({"doc_id": nodes, "cluster_id": nodes})

    labels = keyed_partition_map(
        keyed_partition_map(
            edges, keys=["doc_a"], order_col="doc_b", fn=init_labels,
            num_partitions=num_partitions,
        ),
        keys=["doc_id"],
        order_col="cluster_id",
        fn=lambda pdf: pdf.drop_duplicates("doc_id"),
        num_partitions=num_partitions,
    ).materialize()

    # ---- pass 1: both edge orientations in ONE keyed join ----------------

    def edge_rows_both(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table(
                {
                    "key": pa.array([], pa.int64()),
                    "other": pa.array([], pa.int64()),
                    "label": pa.array([], pa.int64()),
                    "kind": pa.array([], pa.int8()),
                }
            )
        a, b = _i64(batch.column("doc_a")), _i64(batch.column("doc_b"))
        return pa.table(
            {
                "key": pa.chunked_array([*a.chunks, *b.chunks]),
                "other": pa.chunked_array([*b.chunks, *a.chunks]),
                "label": pa.nulls(2 * n, pa.int64()),
                "kind": pa.array(np.zeros(2 * n, dtype=np.int8)),
            }
        )

    def label_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "key": _i64(batch.column("doc_id")),
                "other": pa.nulls(n, pa.int64()),
                "label": _i64(batch.column("cluster_id")),
                "kind": pa.array(np.ones(n, dtype=np.int8)),
            }
        )

    def offers(pdf: pd.DataFrame) -> pd.DataFrame:
        is_lab = pdf["kind"].to_numpy() == 1
        lookup = pd.Series(
            pdf.loc[is_lab, "label"].to_numpy(np.int64),
            index=pdf.loc[is_lab, "key"].to_numpy(np.int64),
        )
        e = pdf.loc[~is_lab]
        lab = e["key"].map(lookup)
        ok = lab.notna()
        if not ok.any():
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype=np.int64),
                 "offer": pd.Series([], dtype=np.int64)}
            )
        return pd.DataFrame(
            {
                "doc_id": e.loc[ok, "other"].to_numpy(np.int64),
                "offer": lab[ok].to_numpy(np.int64),
            }
        )

    # ---- pass 2: min-reduce offers with current labels -------------------

    def offer_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": _i64(batch.column("doc_id")),
                "offer": _i64(batch.column("offer")),
                "is_current": pa.array(np.zeros(batch.num_rows, dtype=np.int8)),
            }
        )

    def cur_label_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": _i64(batch.column("doc_id")),
                "offer": _i64(batch.column("cluster_id")),
                "is_current": pa.array(np.ones(batch.num_rows, dtype=np.int8)),
            }
        )

    def reduce_min(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return _empty_changed()
        g = pdf.groupby("doc_id", sort=False)
        mn = g["offer"].min()
        cur = pdf[pdf["is_current"] == 1].set_index("doc_id")["offer"]
        # every node HAS a current-label row, so cur covers mn's index
        cur = cur.reindex(mn.index)
        return pd.DataFrame(
            {
                "doc_id": mn.index.to_numpy(np.int64),
                "cluster_id": mn.to_numpy(np.int64),
                "changed": (mn < cur).to_numpy().astype(np.int8),
            }
        )

    # ---- pass 3: pointer doubling (labels ⋈ labels) ----------------------

    def query_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": _i64(batch.column("cluster_id")),
                "doc_id": _i64(batch.column("doc_id")),
                "label": _i64(batch.column("cluster_id")),
                "kind": pa.array(np.zeros(batch.num_rows, dtype=np.int8)),
            }
        )

    def target_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": _i64(batch.column("doc_id")),
                "doc_id": pa.nulls(batch.num_rows, pa.int64()),
                "label": _i64(batch.column("cluster_id")),
                "kind": pa.array(np.ones(batch.num_rows, dtype=np.int8)),
            }
        )

    def double(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return _empty_changed()
        is_t = pdf["kind"].to_numpy() == 1
        lookup = pd.Series(
            pdf.loc[is_t, "label"].to_numpy(np.int64),
            index=pdf.loc[is_t, "key"].to_numpy(np.int64),
        )
        q = pdf.loc[~is_t]
        old = q["label"].to_numpy(np.int64)
        hop = q["key"].map(lookup)
        new = np.minimum(hop.fillna(q["label"]).to_numpy(np.int64), old)
        out = pd.DataFrame(
            {
                "doc_id": q["doc_id"].to_numpy(np.int64),
                "cluster_id": new,
                "changed": (new < old).astype(np.int8),
            }
        )
        return out if not out.empty else _empty_changed()

    def arrow(ds_, fn):
        return ds_.map_batches(fn, batch_format="pyarrow", batch_size=None)

    import os
    import time

    trace = os.environ.get("ARLAS_CC_TRACE") == "1"

    for _round in range(max_rounds):
        _t0 = time.time()
        offer_ds = keyed_partition_map(
            arrow(edges, edge_rows_both).union(arrow(labels, label_rows)),
            keys=["key"], order_col="kind", fn=offers,
            num_partitions=num_partitions,
        )
        propagated = keyed_partition_map(
            arrow(offer_ds, offer_rows).union(arrow(labels, cur_label_rows)),
            keys=["doc_id"], order_col="offer", fn=reduce_min,
            num_partitions=num_partitions,
        ).materialize()
        _t1 = time.time()
        n_prop = propagated.sum("changed") or 0
        _t2 = time.time()
        labels = propagated.drop_columns(["changed"])

        doubled = keyed_partition_map(
            arrow(labels, query_rows).union(arrow(labels, target_rows)),
            keys=["key"], order_col="kind", fn=double,
            num_partitions=num_partitions,
        ).materialize()
        _t3 = time.time()
        n_double = doubled.sum("changed") or 0
        # repartition: unions SUM their inputs' block counts, so without
        # this the label dataset doubles its block count every round
        # (8 rows across 256 blocks by round 7 → task explosion)
        labels = (
            doubled.drop_columns(["changed"])
            .repartition(num_partitions)
            .materialize()
        )
        if trace:
            print(
                f"[cc-step] prop={_t1 - _t0:.2f} sum1={_t2 - _t1:.2f} "
                f"double={_t3 - _t2:.2f} rest={time.time() - _t3:.2f}"
            )

        if trace:
            print(
                f"[cc] round={_round} changed_prop={n_prop} "
                f"changed_double={n_double} t={time.time() - _t0:.2f}s"
            )
        if n_prop == 0 and n_double == 0:
            break
    return labels


def connected_components(
    pairs_ds,
    *,
    driver_threshold: int = 1_000_000,
    max_rounds: int = 50,
    num_partitions: int = 16,
) -> pd.DataFrame:
    """pandas-facing wrapper: the label table is bounded by the number of
    documents that appear in any dup pair (NOT the corpus), so collecting
    it is safe wherever the caller wants a DataFrame."""
    return (
        connected_components_ds(
            pairs_ds,
            driver_threshold=driver_threshold,
            max_rounds=max_rounds,
            num_partitions=num_partitions,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
