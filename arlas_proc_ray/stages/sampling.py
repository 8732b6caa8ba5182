"""Deterministic, SQL-reproducible sampling / split assignment.

Training-data pipelines need splits and samples that are (a) stable
across reruns and cluster sizes, (b) derivable per row with no global
state, and (c) auditable by an external system. Random sampling gives
none of these; CONTENT-HASH assignment gives all three: every row's
bucket is ``sha256(key) mod 1000``, computed identically here (vectorized
buffer-sliced sha256, functions/hashing.py) and in SQL
(``CAST('0x' || substr(sha256(x),1,15) AS BIGINT) % 1000``).

This is one stateless ``map_batches`` — no shuffle, no driver state, and
the assignment never changes when the data is repartitioned or the
cluster is resized (the property a `random_sample` split lacks).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from arlas_proc_ray.functions.hashing import sha256_prefix_int


def hash_buckets(col: pa.Array | pa.ChunkedArray, mod: int = 1000) -> np.ndarray:
    """Stable per-row bucket: sha256 of the stringified key, mod ``mod``."""
    as_str = pc.cast(col, pa.string())
    return sha256_prefix_int(as_str) % np.int64(mod)


def split_by_hash(
    ds,
    *,
    key_col: str,
    val_permille: int = 100,
    test_permille: int = 0,
    split_col: str = "split",
    bucket_col: str | None = "bucket",
):
    """Assign train/val(/test) splits by content hash of ``key_col``.

    Buckets ``[0, val)`` → val, ``[val, val+test)`` → test, rest → train.
    """

    def assign(batch: pa.Table) -> pa.Table:
        b = hash_buckets(batch.column(key_col))
        split = np.where(
            b < val_permille,
            "val",
            np.where(b < val_permille + test_permille, "test", "train"),
        )
        out = batch
        if bucket_col is not None:
            out = out.append_column(bucket_col, pa.array(b, pa.int64()))
        return out.append_column(split_col, pa.array(split, pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow", batch_size=None)


def deterministic_sample(ds, *, key_col: str, keep_permille: int):
    """Keep rows whose hash bucket < ``keep_permille`` (stable ≈0.1% grain)."""

    def keep(batch: pa.Table) -> pa.Table:
        b = hash_buckets(batch.column(key_col))
        return batch.filter(pa.array(b < keep_permille))

    return ds.map_batches(keep, batch_format="pyarrow", batch_size=None)


def mixture_plan(
    ds,
    *,
    domain_col: str,
    weights: dict,
    size_col: str | None = None,
    budget: int | None = None,
    bucket_mod: int = 1_000_000,
) -> dict:
    """Plan a deterministic domain-mixture sample (DoReMi-style static
    data mixing): per-domain acceptance thresholds hitting target
    proportions ``weights`` (INTEGER parts — e.g. {'en': 50, 'fr': 20} —
    so the whole plan is exact integer arithmetic, bit-reproducible in
    SQL; float weights would 1-ULP-diverge between kernels).

    One combiner-first pass computes per-domain available mass (row
    count, or ``sum(size_col)`` for token-weighted mixing); the driver
    then solves for the largest total ``B`` ≤ ``budget`` reachable
    WITHOUT upsampling any domain and the per-domain thresholds

        thr_d = (w_d * B * bucket_mod) // (W * m_d)

    A row of domain d survives iff ``sha256(key) % bucket_mod < thr_d``
    — stateless, stable under repartitioning/cluster resize, auditable
    in SQL. Domains absent from ``weights`` are dropped; a weighted
    domain with zero mass is a loud error (its share is unmeetable).
    """
    if not weights or any(
        (not isinstance(w, (int, np.integer))) or w < 0
        for w in weights.values()
    ):
        raise ValueError("weights must be non-negative INTEGER parts")
    W = int(sum(weights.values()))
    if W <= 0:
        raise ValueError("weights sum to zero")

    cols = [domain_col] + ([size_col] if size_col else [])

    def partial(batch: pa.Table) -> pa.Table:
        if size_col is None:
            vc = pc.value_counts(
                batch.column(domain_col).combine_chunks()
            )
            return pa.table(
                {"domain": vc.field("values"),
                 "m": pc.cast(vc.field("counts"), pa.int64())}
            )
        import pandas as pd

        g = (
            pd.DataFrame(
                {
                    "domain": batch.column(domain_col).to_pandas(),
                    "m": batch.column(size_col).to_pandas(),
                }
            )
            .groupby("domain", sort=False)["m"].sum().reset_index()
        )
        return pa.Table.from_pandas(
            g, preserve_index=False
        ).replace_schema_metadata(None)

    partials = (
        ds.select_columns(cols)
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .to_pandas()  # ≤ #domains rows per batch — tiny by construction
    )
    mass = {
        str(d): int(m)
        for d, m in partials.groupby("domain")["m"].sum().items()
    }
    for d, w in weights.items():
        if w > 0 and mass.get(str(d), 0) <= 0:
            raise ValueError(
                f"domain {d!r} has weight {w} but no mass in the input"
            )
    b_max = min(
        (mass[str(d)] * W) // int(w)
        for d, w in weights.items() if w > 0
    )
    B = b_max if budget is None else min(int(budget), b_max)
    thresholds = {
        str(d): (int(w) * B * bucket_mod) // (W * mass[str(d)])
        for d, w in weights.items() if w > 0
    }
    return {
        "mass": mass, "total": B, "thresholds": thresholds,
        "bucket_mod": bucket_mod, "weight_sum": W,
    }


def mixture_sample(
    ds,
    *,
    domain_col: str,
    key_col: str,
    weights: dict,
    size_col: str | None = None,
    budget: int | None = None,
    bucket_mod: int = 1_000_000,
    plan: dict | None = None,
):
    """Filter ``ds`` to the deterministic domain mixture (see
    ``mixture_plan``; pass a precomputed ``plan`` to skip the mass
    pass, e.g. when sampling several column subsets of one corpus)."""
    import pandas as pd

    if plan is None:
        plan = mixture_plan(
            ds, domain_col=domain_col, weights=weights,
            size_col=size_col, budget=budget, bucket_mod=bucket_mod,
        )
    thr = plan["thresholds"]
    mod = plan["bucket_mod"]

    def keep(batch: pa.Table) -> pa.Table:
        b = hash_buckets(batch.column(key_col), mod=mod)
        t = (
            pd.Series(batch.column(domain_col).to_pandas(), dtype=object)
            .map(thr).fillna(0).to_numpy(np.int64)
        )
        return batch.filter(pa.array(b < t))

    return ds.map_batches(keep, batch_format="pyarrow", batch_size=None)


def stratified_sample(
    ds,
    *,
    group_cols,
    key_col: str,
    k: int,
    num_partitions: int = 8,
):
    """Deterministic per-stratum sample: the ``k`` rows with the smallest
    ``sha256(key)`` in each group.

    Content-hash ranking makes the sample (a) stable across reruns,
    repartitioning and cluster sizes, and (b) exactly reproducible by an
    external auditor (``row_number() OVER (PARTITION BY group ORDER BY
    sha256-prefix(key), key)`` in SQL). A per-batch combiner keeps at most
    ``k`` rows per (batch, group) BEFORE the shuffle, so the keyed exchange
    carries ≤ k·|groups| rows per block regardless of input size — the
    stratum itself never needs to co-locate.
    """
    group_cols = list(group_cols)

    def add_rank(batch: pa.Table) -> pa.Table:
        h = sha256_prefix_int(pc.cast(batch.column(key_col), pa.string()))
        return batch.append_column("_hrank", pa.array(h, pa.int64()))

    def partial_topk(pdf):
        return (
            pdf.sort_values(["_hrank", key_col], kind="mergesort")
            .groupby(group_cols, sort=False)
            .head(k)
        )

    def final_topk(pdf):
        out = (
            pdf.sort_values(group_cols + ["_hrank", key_col], kind="mergesort")
            .groupby(group_cols, sort=False)
            .head(k)
        )
        return out.drop(columns=["_hrank"])

    from arlas_proc_ray.stages.keyed import keyed_partition_map

    combined = ds.map_batches(add_rank, batch_format="pyarrow", batch_size=None
                              ).map_batches(partial_topk, batch_format="pandas", batch_size=None)
    return keyed_partition_map(
        combined, keys=group_cols, order_col="_hrank", fn=final_topk,
        num_partitions=num_partitions,
    )


def training_shuffle(
    ds,
    id_col: str,
    shuffle_epoch: int,
    *,
    target: str = "shuffle_pos",
    num_partitions: int = 16,
):
    """Deterministic epoch-seeded global shuffle order for training data.

    ``random_shuffle`` gives an irreproducible permutation; training wants
    one that is (a) uniform, (b) DIFFERENT per ``shuffle_epoch``, and
    (c) exactly reproducible after a crash or on a resized cluster. The
    permutation is the exact global rank of ``sha256(id#epoch)``
    (stages/scan.py:global_rank — two-pass range-partitioned, nothing
    random, no driver-side sort). A consumer reads shard k of E as
    ``shuffle_pos % num_shards == k``.
    """
    from arlas_proc_ray.stages.scan import global_rank

    salt = f"#{int(shuffle_epoch)}"

    def add_h(batch: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            pc.cast(batch.column(id_col), pa.string()),
            pa.array([salt] * batch.num_rows, pa.string()),
            "",
        )
        return batch.append_column(
            "_shuffle_h", pa.array(sha256_prefix_int(key), pa.int64())
        )

    ds = ds.map_batches(add_h, batch_format="pyarrow", batch_size=None)
    ranked = global_rank(
        ds,
        order_cols=["_shuffle_h", id_col],
        target=target,
        num_partitions=num_partitions,
    )
    return ranked.drop_columns(["_shuffle_h"])
