"""Incrementally-maintained IVF vector index over a snapshot store.

Companion to the near-dup index (``dedup/incremental.py``), for the
similarity-search side of a CDC ingest pipeline: ``refresh_vector_index``
keeps an inverted-file index — rows ``(bucket, key, vec)`` partitioned by
coarse-centroid bucket — of a snapshot store's state table, maintained
epoch-over-epoch from the change data feed instead of re-embedding or
re-assigning the corpus:

- **I** rows assign the new vector to its nearest centroid and add it,
- **U** rows retract the OLD vector's row (its bucket is recomputed
  deterministically from the PINNED centroids and the feed's pre-image)
  and add the new vector's row,
- **D** rows retract the final image's row.

Centroids are trained ONCE at bootstrap (seeded k-means on a random
sample of the state) and pinned in the checkpoint — the standard IVF
contract (as in FAISS: adding/removing vectors never moves the coarse
quantizer; retraining is an explicit rebuild via ``full=True``).

``vector_index_topk`` answers cosine top-k queries by reading ONLY the
index partitions holding the queries' ``n_probe`` closest buckets —
partition pruning straight from the checkpoint, no corpus scan.
``n_probe == n_centroids`` degrades gracefully to exact brute force
(the SQL-oracle mode). ``epoch_vector_neighbors`` asks the ingest-time
question: which vectors changed THIS epoch have near neighbours already
in the corpus?

Vectors ride the store's string payload columns as base64-encoded
little-endian float32 (``encode_vec_f32`` / ``decode_vec_f32``) — the
store schema stays string-typed; the index parts hold raw binary.

Reference parity: ARLAS-proc has no vector search at all; the batch IVF
(`ann/ivf.py`) is the from-scratch equivalent and the oracle (exact mode
must equal brute force / DuckDB ``list_cosine_similarity``).

Scale shape:

- **Refresh cost ∝ changed docs**: the feed is manifest-pruned,
  assignment is one tiny matmul per changed batch against broadcast
  centroids, and only the touched bucket partitions are rewritten.
- **Search cost ∝ probed partitions**, not corpus: the probe set is
  computed driver-side from the (tiny) centroid matrix; unprobed
  partitions are never read.
- **Byte-exact removals** on UTF-8-encoded keys (pandas object-string
  merges collapse NUL-distinct keys).
- **Crash-safe**: parts are written atomically under an epoch suffix,
  the checkpoint moves last; reruns recompute the same deltas — idempotent.
"""

from __future__ import annotations

import base64
import json
import os
from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

from arlas_proc_ray.ann.ivf import kmeans_fit
from arlas_proc_ray.ann.search import _normalize
from arlas_proc_ray.cdc.publish import stable_doc_ids
from arlas_proc_ray.cdc.snapshot import SnapshotStore, _atomic_write_bytes
from arlas_proc_ray.dedup.incremental import _state_dataset


# ---------------------------------------------------------------- codecs
def encode_vec_f32(mat: np.ndarray) -> list[str]:
    """(n, d) float array → base64(little-endian float32 bytes) per row."""
    m = np.ascontiguousarray(np.asarray(mat, dtype="<f4"))
    return [base64.b64encode(row.tobytes()).decode("ascii") for row in m]


def decode_vec_f32(values) -> np.ndarray:
    """Sequence of base64 strings → (n, d) float64 matrix."""
    rows = [
        np.frombuffer(base64.b64decode(v), dtype="<f4").astype(np.float64)
        for v in values
    ]
    if not rows:
        return np.empty((0, 0), dtype=np.float64)
    return np.stack(rows)


# ------------------------------------------------------------- index io
_COLS = ["bucket", "key", "vec"]


def _index_dir(store: SnapshotStore, index_id: str) -> str:
    return os.path.join(store.root, "vecindex", index_id)


def _part_path(store: SnapshotStore, index_id: str, p: int, epoch: int) -> str:
    return os.path.join(_index_dir(store, index_id), f"part-{p}-{epoch}.parquet")


def read_vector_checkpoint(store: SnapshotStore, index_id: str) -> dict | None:
    p = os.path.join(_index_dir(store, index_id), "checkpoint.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _centroids_from_ckpt(ckpt: dict) -> np.ndarray:
    raw = base64.b64decode(ckpt["centroids_b64"])
    c = np.frombuffer(raw, dtype="<f8").astype(np.float64)
    return c.reshape(ckpt["n_centroids_fit"], ckpt["dim"])


def _empty_rows_arrow(delta: bool = False) -> pa.Table:
    """Arrow typed empty (Ray's pandas block sizing chokes on zero-length
    object columns)."""
    cols = {
        "bucket": pa.array([], pa.int32()),
        "key": pa.array([], pa.string()),
        "vec": pa.array([], pa.binary()),
    }
    if delta:
        cols["delta"] = pa.array([], pa.int8())
    return pa.table(cols)


def _empty_rows() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "bucket": pd.Series([], dtype=np.int32),
            "key": pd.Series([], dtype=object),
            "vec": pd.Series([], dtype=object),
        }
    )


def _read_part(store: SnapshotStore, index_id: str, p: int, epoch) -> pd.DataFrame:
    import pyarrow.parquet as pq

    if epoch is None:
        return _empty_rows()
    path = _part_path(store, index_id, p, int(epoch))
    if not os.path.exists(path):
        return _empty_rows()
    return pq.read_table(path).to_pandas()


def _write_part(store: SnapshotStore, index_id: str, p: int, epoch: int,
                pdf: pd.DataFrame) -> None:
    import pyarrow.parquet as pq

    os.makedirs(_index_dir(store, index_id), exist_ok=True)
    tbl = pa.table(
        {
            "bucket": pa.array(pdf["bucket"].to_numpy(np.int32), pa.int32()),
            "key": pa.array(pdf["key"].astype(object), pa.string()),
            "vec": pa.array(list(pdf["vec"]), pa.binary()),
        }
    )
    sink = pa.BufferOutputStream()
    pq.write_table(tbl, sink)
    _atomic_write_bytes(
        _part_path(store, index_id, p, epoch), sink.getvalue().to_pybytes()
    )


def _assign(mat: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    """Nearest-centroid bucket per row (cosine on unit vectors)."""
    if not len(mat):
        return np.empty(0, dtype=np.int32)
    sims = _normalize(mat) @ centroids.T
    return np.argmax(sims, axis=1).astype(np.int32)


# -------------------------------------------------------------- refresh
def refresh_vector_index(
    store: SnapshotStore,
    *,
    index_id: str = "default",
    key_cols: Sequence[str] = ("repo", "path"),
    vec_col: str = "content",
    epoch: int | str | None = None,
    n_centroids: int = 64,
    num_partitions: int = 8,
    train_sample: int = 20_000,
    seed: int = 17,
    centroids: np.ndarray | None = None,
    full: bool = False,
    commit_checkpoint: bool = True,
) -> dict:
    """Bring the IVF index up to ``epoch`` (default: latest committed).

    Bootstrap trains (seeded, random-sample) centroids and assigns the
    whole state once; every later refresh assigns only the changed
    vectors from the change feed and rewrites only the bucket partitions
    they route to. ``centroids=`` pins an externally-trained quantizer
    (tests; cross-index comparability).
    """
    import ray

    from arlas_proc_ray.cdc.feed import change_feed

    key_cols = list(key_cols)
    target = store._resolve_epoch_arg(epoch)
    if target is None:
        raise RuntimeError("no committed epoch to index")
    spec = {
        "n_centroids": n_centroids, "num_partitions": num_partitions,
        "key_cols": key_cols, "vec_col": vec_col, "seed": seed,
    }
    ckpt = None if full else read_vector_checkpoint(store, index_id)
    if ckpt is not None and ckpt.get("spec") != spec:
        ckpt = None  # parameter drift: assignments incomparable -> rebuild
    base = ckpt["epoch"] if ckpt else None
    if base is not None and (
        store.read_epoch_summary(base)["num_partitions"]
        != store.read_epoch_summary(target)["num_partitions"]
    ):
        # store fan-out changed: the feed cannot supply pre-images for
        # removals across the boundary -> rebuild from the target state
        ckpt, base = None, None

    if base == target:
        return {
            "index_id": index_id, "epoch": target, "base_epoch": base,
            "mode": "noop", "partitions_touched": 0,
            "sources": dict(ckpt["sources"]),
        }

    if ckpt is not None:
        cents = _centroids_from_ckpt(ckpt)
    elif centroids is not None:
        cents = _normalize(np.asarray(centroids, dtype=np.float64))
    else:
        # train on a RANDOM bounded sample of the state (a prefix sample
        # would cover only the head of a clustered key domain)
        state = _state_dataset(store, target, [vec_col])
        rows = store.read_epoch_summary(target)["row_count"]
        frac = min(1.0, (train_sample * 1.5) / max(rows, 1))
        sampled = state if frac >= 1.0 else state.random_sample(frac, seed=seed)
        sample_pdf = sampled.limit(train_sample).to_pandas()
        if not len(sample_pdf):
            raise RuntimeError("state has no rows to train centroids on")
        cents = kmeans_fit(
            decode_vec_f32(sample_pdf[vec_col]), n_centroids, seed=seed
        )
    cents_ref = ray.put(cents)

    if base is None:
        state = _state_dataset(store, target, key_cols + [vec_col])

        def to_rows(pdf: pd.DataFrame):
            c = ray.get(cents_ref)
            live = pdf[pdf[vec_col].notna() & (pdf[vec_col] != "")]
            if not len(live):
                return _empty_rows_arrow(delta=True)
            mat = decode_vec_f32(live[vec_col])
            return pd.DataFrame(
                {
                    "bucket": _assign(mat, c),
                    "key": stable_doc_ids(live, key_cols).to_numpy(object),
                    "vec": [
                        np.ascontiguousarray(r, dtype="<f4").tobytes()
                        for r in mat
                    ],
                    "delta": np.full(len(live), 1, dtype=np.int8),
                }
            )

        deltas = state.map_batches(to_rows, batch_format="pandas")
    else:
        feed = change_feed(
            store, base=base, target=target,
            columns=[vec_col], compare_cols=[vec_col],
            include_old=[vec_col],
        )

        def feed_to_rows(pdf: pd.DataFrame):
            if not len(pdf):
                return _empty_rows_arrow(delta=True)
            c = ray.get(cents_ref)
            keys = stable_doc_ids(pdf, key_cols)
            ops = pdf["op"].to_numpy()
            frames = []

            def rows_for(mask, col, sign: int):
                sub = pdf.loc[mask]
                live = sub[col].notna() & (sub[col] != "")
                sub = sub.loc[live]
                if not len(sub):
                    return None
                mat = decode_vec_f32(sub[col])
                return pd.DataFrame(
                    {
                        "bucket": _assign(mat, c),
                        "key": keys.loc[sub.index].to_numpy(object),
                        "vec": [
                            np.ascontiguousarray(r, dtype="<f4").tobytes()
                            for r in mat
                        ],
                        "delta": np.full(len(sub), sign, dtype=np.int8),
                    }
                )

            a = rows_for((ops == "I") | (ops == "U"), vec_col, 1)
            if a is not None:
                frames.append(a)
            # U retracts the OLD image (bucket recomputed from the pinned
            # centroids — deterministic); D rows carry the old image in
            # the main column already
            u = rows_for(ops == "U", f"old_{vec_col}", -1)
            if u is not None:
                frames.append(u)
            d = rows_for(ops == "D", vec_col, -1)
            if d is not None:
                frames.append(d)
            if not frames:
                return _empty_rows_arrow(delta=True)
            return pd.concat(frames, ignore_index=True)

        deltas = feed.map_batches(feed_to_rows, batch_format="pandas")

    def add_part(t: pa.Table) -> pa.Table:
        b = t.column("bucket").to_numpy(zero_copy_only=False)
        pid = (b.astype(np.int64) % num_partitions).astype(np.int32)
        return t.append_column("_part", pa.array(pid, pa.int32()))

    deltas = deltas.map_batches(add_part, batch_format="pyarrow")
    sources = dict(ckpt["sources"]) if ckpt else {}

    def fold(group: pd.DataFrame) -> pd.DataFrame:
        p = int(group["_part"].iloc[0])
        old = _read_part(store, index_id, p, sources.get(str(p)))
        dlt = group["delta"].to_numpy()
        adds = group.loc[dlt > 0, _COLS]
        rems = group.loc[dlt < 0, _COLS]
        if len(rems) and len(old):
            # byte-exact anti-join on (bucket, encoded key) — a doc holds
            # exactly one row per index, so the pair identifies it
            ok_ = old.assign(_k=old["key"].str.encode("utf-8"))
            rk = rems.assign(_k=rems["key"].str.encode("utf-8"))
            m = ok_.merge(
                rk[["bucket", "_k"]].drop_duplicates(),
                on=["bucket", "_k"], how="left", indicator=True,
            )
            old = m.loc[m["_merge"] == "left_only", _COLS].reset_index(
                drop=True
            )
        new = pd.concat([old, adds], ignore_index=True)
        if len(new):
            enc = new["key"].str.encode("utf-8")
            # keep the LAST image of a key re-added within the window
            new = new.loc[~new.assign(_k=enc).duplicated(
                ["bucket", "_k"], keep="last"
            )].reset_index(drop=True)
        _write_part(store, index_id, p, target, new)
        return pd.DataFrame(
            {"part": [p], "rows": [len(new)],
             "added": [int(len(adds))], "removed": [int(len(rems))]}
        )

    stats = (
        deltas.groupby("_part")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    for _, r in stats.iterrows():
        sources[str(int(r["part"]))] = target
    if base is None:
        for p in range(num_partitions):
            if str(p) not in sources:
                _write_part(store, index_id, p, target, _empty_rows())
                sources[str(p)] = target

    out = {
        "index_id": index_id,
        "epoch": target,
        "base_epoch": base,
        "mode": "bootstrap" if base is None else "incremental",
        "partitions_touched": int(len(stats)),
        "rows_added": int(stats["added"].sum()) if len(stats) else 0,
        "rows_removed": int(stats["removed"].sum()) if len(stats) else 0,
        "sources": sources,
    }
    if commit_checkpoint:
        ckpt_out = {
            "index_id": index_id, "epoch": target, "spec": spec,
            "sources": sources,
            "n_centroids_fit": int(cents.shape[0]),
            "dim": int(cents.shape[1]),
            "centroids_b64": base64.b64encode(
                np.ascontiguousarray(cents, dtype="<f8").tobytes()
            ).decode("ascii"),
            "last_refresh": {
                k: out[k]
                for k in ("base_epoch", "mode", "partitions_touched",
                          "rows_added", "rows_removed")
            },
        }
        _atomic_write_bytes(
            os.path.join(_index_dir(store, index_id), "checkpoint.json"),
            json.dumps(ckpt_out).encode(),
        )
        store.tag(f"vecindex-{index_id}", target)
        live = {f"part-{p}-{e}.parquet" for p, e in sources.items()}
        for f in os.listdir(_index_dir(store, index_id)):
            if f.startswith("part-") and f not in live:
                try:
                    os.remove(os.path.join(_index_dir(store, index_id), f))
                except OSError:
                    pass
    return out


def read_vector_index(store: SnapshotStore, index_id: str = "default") -> pd.DataFrame:
    """The whole index as one frame (tests / small corpora only)."""
    ckpt = read_vector_checkpoint(store, index_id)
    if ckpt is None:
        raise RuntimeError(f"index {index_id!r} has never been refreshed")
    parts = [
        _read_part(store, index_id, int(p), e)
        for p, e in sorted(ckpt["sources"].items(), key=lambda kv: int(kv[0]))
    ]
    return pd.concat(parts, ignore_index=True) if parts else _empty_rows()


# --------------------------------------------------------------- search
def vector_index_topk(
    store: SnapshotStore,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    *,
    index_id: str = "default",
    k: int = 3,
    n_probe: int = 8,
) -> pd.DataFrame:
    """Cosine top-k per query against the index, reading ONLY the
    partitions that hold the queries' ``n_probe`` closest buckets.

    ``n_probe >= n_centroids`` is exact brute force over the indexed
    corpus. Returns (query_id, key, cos_sim) — ≤k rows per query,
    deterministic (key tie-break); cos_sim is full-precision float64.
    """
    import ray
    import ray.data as rd

    ckpt = read_vector_checkpoint(store, index_id)
    if ckpt is None:
        raise RuntimeError(f"index {index_id!r} has never been refreshed")
    cents = _centroids_from_ckpt(ckpt)
    num_partitions = ckpt["spec"]["num_partitions"]
    sources = ckpt["sources"]

    qmat = _normalize(np.asarray(query_matrix, np.float64))
    qids = np.asarray(query_ids)
    probe = min(n_probe, cents.shape[0])
    qsims = qmat @ cents.T
    probed = np.argpartition(-qsims, kth=probe - 1, axis=1)[:, :probe]
    probed_buckets = np.unique(probed)
    probed_parts = sorted(
        {int(b) % num_partitions for b in probed_buckets}
    )
    files = [
        _part_path(store, index_id, p, int(sources[str(p)]))
        for p in probed_parts
        if str(p) in sources
        and os.path.exists(_part_path(store, index_id, p, int(sources[str(p)])))
    ]
    if not files:
        return pd.DataFrame(
            {"query_id": pd.Series([], dtype=qids.dtype),
             "key": pd.Series([], dtype=object),
             "cos_sim": pd.Series([], dtype=np.float64)}
        )

    state_ref = ray.put(
        {"qids": qids, "qmat": qmat, "probed": probed,
         "bucket_set": set(int(b) for b in probed_buckets)}
    )

    def score(batch: pa.Table):
        st = ray.get(state_ref)
        buckets = batch.column("bucket").to_numpy(zero_copy_only=False)
        keep = np.isin(buckets, list(st["bucket_set"]))
        if not keep.any():
            return pd.DataFrame(
                {"query_id": pd.Series([], dtype=st["qids"].dtype),
                 "key": pd.Series([], dtype=object),
                 "cos_sim": pd.Series([], dtype=np.float64)})
        keys = np.asarray(batch.column("key").to_pylist(), dtype=object)[keep]
        # index parts hold raw little-endian float32 bytes, not base64
        vecs = np.stack([
            np.frombuffer(v, dtype="<f4").astype(np.float64)
            for v, m in zip(batch.column("vec").to_pylist(), keep) if m
        ])
        mat = _normalize(vecs)
        bkt = buckets[keep]
        frames = []
        for qi in range(len(st["qids"])):
            q_buckets = set(int(b) for b in st["probed"][qi])
            mask = np.isin(bkt, list(q_buckets))
            if not mask.any():
                continue
            sims = mat[mask] @ st["qmat"][qi]
            order = np.lexsort((keys[mask], -sims))[:k]
            frames.append(pd.DataFrame(
                {"query_id": st["qids"][qi],
                 "key": keys[mask][order],
                 "cos_sim": sims[order]}
            ))
        if not frames:
            return pd.DataFrame(
                {"query_id": pd.Series([], dtype=st["qids"].dtype),
                 "key": pd.Series([], dtype=object),
                 "cos_sim": pd.Series([], dtype=np.float64)})
        return pd.concat(frames, ignore_index=True)

    partials = rd.read_parquet(files).map_batches(
        score, batch_format="pyarrow"
    ).to_pandas()
    if not len(partials):
        return partials
    # final per-query reduce on ≤ (parts × queries × k) rows — tiny
    partials = partials.sort_values(
        ["query_id", "cos_sim", "key"], ascending=[True, False, True],
        kind="mergesort",
    )
    return (
        partials.groupby("query_id", sort=True)
        .head(k)
        .reset_index(drop=True)
    )


def epoch_vector_neighbors(
    store: SnapshotStore,
    *,
    index_id: str = "default",
    base: int | str,
    target: int | str | None = None,
    k: int = 3,
    n_probe: int = 8,
    min_sim: float | None = None,
) -> pd.DataFrame:
    """Nearest indexed neighbours of the vectors changed in (base, target].

    The ingest-time question: which documents that changed THIS epoch
    are similar to anything already in the corpus? Probes the index with
    the changed docs' new vectors (cost ∝ changed docs); self-matches
    are dropped. Returns (query_key, key, cos_sim).
    """
    from arlas_proc_ray.cdc.feed import change_feed

    ckpt = read_vector_checkpoint(store, index_id)
    if ckpt is None:
        raise RuntimeError(f"index {index_id!r} has never been refreshed")
    t = store._resolve_epoch_arg(target)
    if ckpt["epoch"] != t:
        raise RuntimeError(
            f"index {index_id!r} is at epoch {ckpt['epoch']}, probe wants "
            f"{t}: refresh_vector_index first"
        )
    spec = ckpt["spec"]
    key_cols = list(spec["key_cols"])
    vec_col = spec["vec_col"]

    feed = change_feed(
        store, base=base, target=t,
        columns=[vec_col], compare_cols=[vec_col],
    ).to_pandas()
    changed = feed[feed["op"].isin(["I", "U"])] if len(feed) else feed
    if not len(changed):
        return pd.DataFrame(
            {"query_key": pd.Series([], dtype=object),
             "key": pd.Series([], dtype=object),
             "cos_sim": pd.Series([], dtype=np.float64)}
        )
    live = changed[changed[vec_col].notna() & (changed[vec_col] != "")]
    qkeys = stable_doc_ids(live, key_cols).to_numpy(object)
    qmat = decode_vec_f32(live[vec_col])
    hits = vector_index_topk(
        store, qkeys, qmat, index_id=index_id, k=k + 1, n_probe=n_probe,
    ).rename(columns={"query_id": "query_key"})
    hits = hits[hits["query_key"] != hits["key"]]
    hits = hits.groupby("query_key", sort=True).head(k)
    if min_sim is not None:
        hits = hits[hits["cos_sim"] >= min_sim]
    return hits.reset_index(drop=True)
