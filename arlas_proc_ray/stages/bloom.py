"""Bloom-filter join prefilter — build distributed, probe broadcast.

The canonical 100-TB join optimization the reference lacks (ARLAS-proc's
only join-shaped ops are driver-collected lookups,
transform/WithCountryNameFormatted.scala:38-70): when a selective build
side would otherwise force the BIG side through an all-to-all semi-join
shuffle, build a bloom filter over the build keys (distributed: each
batch collapses to one packed bitmap, driver ORs the tiny partials),
``ray.put`` the final bitmap ONCE, and filter the big side inside
``map_batches`` — the big side never shuffles, and survivors (true
matches + the ~(1-e^{-kn/m})^k false-positive sliver) are small enough
for an exact broadcast semi-join afterwards.

SQL parity: the k hash functions are Kirsch-Mitzenmacher double hashing
(published standard: "Less Hashing, Same Performance", 2006) over ONE
``sha256-prefix-int`` per key (functions/hashing.py:70):
``pos_i = (h1 + i*h2) mod m`` with ``h1 = hv mod m`` and
``h2 = (hv // m) mod m | 1`` (odd, hence coprime with the power-of-two
``m``). One sha256 per row instead of k, and DuckDB reproduces every set
bit and the exact survivor set — false positives included — bit-for-bit.
See the ``bloom_filter_probe`` oracle in pipelines/queries.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from arlas_proc_ray.functions.hashing import sha256_prefix_int


def _salted_positions(
    vals: pa.Array | pa.ChunkedArray, num_bits: int, num_hashes: int
) -> list[np.ndarray]:
    """One int64 position array per hash index (double hashing — a single
    sha256 per key); null keys yield position -1 in every array."""
    vals = pc.cast(vals, pa.string())
    hv = sha256_prefix_int(vals)
    null = hv < 0
    h1 = hv % num_bits
    h2 = (hv // num_bits) % num_bits | np.int64(1)
    out = []
    for i in range(num_hashes):
        pos = (h1 + np.int64(i) * h2) % num_bits
        pos[null] = -1
        out.append(pos)
    return out


def bloom_partial_fn(key_col: str, num_bits: int, num_hashes: int):
    """Per-batch combiner: collapse a batch to ONE packed bitmap row."""
    assert num_bits >= 8 and num_bits & (num_bits - 1) == 0, (
        "num_bits must be a power of two (odd h2 must be coprime with m)"
    )

    def partial(batch: pa.Table) -> pa.Table:
        bm = np.zeros(num_bits // 8, dtype=np.uint8)
        vals = batch.column(key_col)
        for pos in _salted_positions(vals, num_bits, num_hashes):
            pos = pos[pos >= 0]
            np.bitwise_or.at(
                bm, pos >> 3, (np.uint8(1) << (pos & 7).astype(np.uint8))
            )
        return pa.table({"bitmap": pa.array([bm.tobytes()], pa.binary())})

    return partial


def bloom_build(
    build_ds, *, key_col: str, num_bits: int = 1 << 20, num_hashes: int = 3
) -> np.ndarray:
    """Distributed bloom build: each batch emits one ``num_bits/8``-byte
    bitmap (the combiner), and the driver ORs those partials — OR is
    associative/commutative/idempotent, so task retries are harmless and
    two epochs' filters merge the same way. Returns the packed uint8
    bitmap (small: 128 KiB at the default 2^20 bits)."""
    partials = build_ds.map_batches(
        bloom_partial_fn(key_col, num_bits, num_hashes),
        batch_format="pyarrow",
        batch_size=None,
    )
    bm = np.zeros(num_bits // 8, dtype=np.uint8)
    for b in partials.iter_batches(batch_format="pyarrow"):
        for buf in b.column("bitmap").to_pylist():
            bm |= np.frombuffer(buf, dtype=np.uint8)
    return bm


def bloom_filter_probe(
    ds,
    bitmap: np.ndarray,
    *,
    key_col: str,
    num_bits: int,
    num_hashes: int,
):
    """Keep rows whose key tests positive in the bloom filter (all k bits
    set). The bitmap is ``ray.put`` ONCE; tasks fetch it from the object
    store (one fetch per worker, shared memory after) and test bits
    vectorized — zero shuffle on the probed side. Null keys never pass."""
    bm_ref = ray.put(bitmap)

    def probe(batch: pa.Table) -> pa.Table:
        bm = ray.get(bm_ref)
        keep = np.ones(batch.num_rows, dtype=bool)
        for pos in _salted_positions(
            batch.column(key_col), num_bits, num_hashes
        ):
            valid = pos >= 0
            p = np.where(valid, pos, 0)
            hit = (bm[p >> 3] >> (p & 7).astype(np.uint8)) & 1
            keep &= valid & (hit == 1)
        return batch.filter(pa.array(keep))

    return ds.map_batches(probe, batch_format="pyarrow", batch_size=None)


def bloom_semi_join(
    big_ds,
    build_ds,
    *,
    big_key: str,
    build_key: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 3,
    exact: bool = True,
):
    """Semi-join ``big_ds`` to ``build_ds`` keys with a bloom prefilter.

    At scale this is the whole point: the big side streams through the
    broadcast bitmap (no shuffle) and only the tiny survivor set pays
    for exactness — an exact broadcast semi-join over the build keys
    (``exact=True``; the build key set must fit in one object — for a
    build side too large for that, chain a second, larger filter or
    fall back to the shuffled ``equi_join``). ``exact=False`` returns
    the raw bloom survivors (deterministic, SQL-reproducible)."""
    bm = bloom_build(
        build_ds, key_col=build_key, num_bits=num_bits, num_hashes=num_hashes
    )
    survivors = bloom_filter_probe(
        big_ds, bm, key_col=big_key, num_bits=num_bits, num_hashes=num_hashes
    )
    if not exact:
        return survivors
    from arlas_proc_ray.stages.lookup import broadcast_semi_join

    keys = build_ds.select_columns([build_key]).to_pandas().drop_duplicates()
    if build_key != big_key:
        keys = keys.rename(columns={build_key: big_key})
    return broadcast_semi_join(survivors, keys, on=[big_key])
