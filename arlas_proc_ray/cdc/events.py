"""Deterministic change-log synthesis (seeded, counter-based, distributable).

Per FIXTURES.md §2-3: events ``(lsn, op, repo, path, commit, lang, content,
schema_version, delivery_index)`` derived deterministically from a seed;
~20% INSERT / ~70% UPDATE / ~10% DELETE; a hot "monorepo" contributes ~50%
of events (skew fixture); ``delivery_index`` differs from ``lsn`` within a
bounded window (out-of-order fixture); a v2 tail renames ``lang`` →
``language`` and adds ``content_size`` (schema-evolution fixture).

Everything is a pure function of ``(seed, lsn)`` via a vectorized
splitmix64, NOT a sequential RNG — so any LSN range can be generated
independently inside any Ray task and the result is identical however the
range is chunked. That is what lets ``changelog_dataset`` fan generation out
with ``ray.data.range(n).map_batches`` at bench scale (the 10^10-event
ambition needs generation to be embarrassingly parallel).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from arlas_proc_ray.schema import SchemaRegistry

LANGS = np.array(["py", "rs", "scala", "ts", "go", "md"])
EXTS = np.array(["py", "rs", "scala", "ts", "go", "md"])

EVENT_SCHEMA_V1 = pa.schema(
    [
        ("lsn", pa.int64()),
        ("op", pa.string()),
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("content", pa.string()),
        ("schema_version", pa.int32()),
        ("delivery_index", pa.int64()),
    ]
)

EVENT_SCHEMA_V2 = pa.schema(
    [
        ("lsn", pa.int64()),
        ("op", pa.string()),
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("language", pa.string()),  # renamed from lang
        ("content", pa.string()),
        ("content_size", pa.int64()),  # new in v2
        ("schema_version", pa.int32()),
        ("delivery_index", pa.int64()),
    ]
)

# canonical = latest version; the normalize stage aligns every batch to this
CANONICAL_EVENT_SCHEMA = EVENT_SCHEMA_V2

FINAL_STATE_SCHEMA = pa.schema(
    [
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("language", pa.string()),
        ("content", pa.string()),
        ("content_size", pa.int64()),
        ("content_sha256", pa.string()),
        ("last_lsn", pa.int64()),
    ]
)


def default_registry() -> SchemaRegistry:
    reg = SchemaRegistry()
    reg.register(1, EVENT_SCHEMA_V1, renames_to_next={"lang": "language"})
    reg.register(2, EVENT_SCHEMA_V2)
    return reg


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 over uint64 — the counter-based PRNG core."""
    with np.errstate(over="ignore"):
        z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


# A deterministic pseudo-code filler sliced per event (cheap, no RNG).
_FILLER_BYTES = None  # set right after _FILLER below

_FILLER = (
    "\n".join(
        f"    val_{i} = compute(input_{i % 7}, mode='{w}')  # step {i}"
        for i, w in enumerate(
            ["fast", "safe", "batch", "stream", "merge", "scan", "sort", "hash"] * 40
        )
    )
    + "\n"
)

# uint8 view for the vectorized content gather (ASCII, so bytes == utf8)
_FILLER_BYTES = np.frombuffer(_FILLER.encode("ascii"), dtype=np.uint8)


@dataclass(frozen=True)
class ChangelogConfig:
    """Parameters of the synthetic change stream (all seeded)."""

    num_events: int = 10_000
    num_keys: int = 1_000
    num_repos: int = 50
    seed: int = 42
    hot_fraction: float = 0.5  # share of events hitting the monorepo key set
    delete_prob: float = 0.10
    insert_prob: float = 0.20
    ooo_window: int = 64  # |delivery_index - lsn| bound
    v2_start_lsn: int | None = None  # lsn at which schema_version becomes 2
    min_content: int = 200
    max_content: int = 2_000

    @property
    def hot_keys(self) -> int:
        return max(1, self.num_keys // 20)

    def v2_boundary(self) -> int:
        """First lsn with schema_version=2 (default: last 40% of the stream)."""
        if self.v2_start_lsn is not None:
            return self.v2_start_lsn
        return (self.num_events * 3) // 5


def _u01(h: np.ndarray) -> np.ndarray:
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def _gen_range(cfg: ChangelogConfig, lo: int, hi: int) -> dict[str, np.ndarray]:
    """Generate raw event columns for lsn in [lo, hi) — pure f(seed, lsn)."""
    lsn = np.arange(lo, hi, dtype=np.int64)
    seed_mix = np.uint64((cfg.seed * 0x5851F42D4C957F2D) % (1 << 64))
    base = lsn.astype(np.uint64) ^ seed_mix

    h_key = _splitmix64(base)
    h_op = _splitmix64(base ^ np.uint64(1))
    h_len = _splitmix64(base ^ np.uint64(2))
    h_misc = _splitmix64(base ^ np.uint64(3))
    h_ooo = _splitmix64(base ^ np.uint64(4))

    # --- key selection with hot-repo skew ---------------------------------
    hot = _u01(h_key) < cfg.hot_fraction
    hot_k = (h_key % np.uint64(cfg.hot_keys)).astype(np.int64)
    n_cold = max(1, cfg.num_keys - cfg.hot_keys)
    cold_k = cfg.hot_keys + (h_key % np.uint64(n_cold)).astype(np.int64)
    key_id = np.where(hot, hot_k, cold_k)

    # --- op mix ------------------------------------------------------------
    r = _u01(h_op)
    is_delete = r < cfg.delete_prob
    is_insert = (~is_delete) & (r < cfg.delete_prob + cfg.insert_prob)

    # --- per-event content length (log-ish spread) --------------------------
    span = cfg.max_content - cfg.min_content
    frac = _u01(h_len) ** 2.0  # skew toward small files
    length = (cfg.min_content + frac * span).astype(np.int64)

    ooo = (h_ooo % np.uint64(max(1, cfg.ooo_window))).astype(np.int64) - (
        cfg.ooo_window // 2
    )
    delivery_index = lsn + ooo

    return {
        "lsn": lsn,
        "key_id": key_id,
        "is_delete": is_delete,
        "is_insert": is_insert,
        "length": length,
        "h_misc": h_misc,
        "delivery_index": delivery_index,
    }


def key_repo_path(key_id: np.ndarray, cfg: ChangelogConfig):
    """Deterministic (repo, path, lang) per key id — Arrow-vectorized.

    Returns (repos, paths, langs) as (pa.Array, pa.Array, numpy); string
    assembly runs in Arrow's C++ ``binary_join_element_wise`` (one
    output buffer, no Python / pandas object strings).
    """
    n_other = max(1, cfg.num_repos - 1)
    repo_idx = 1 + (key_id % n_other)
    lang_idx = (key_id % len(LANGS)).astype(np.int64)

    def s(a: np.ndarray) -> pa.Array:
        return pc.cast(pa.array(a), pa.string())

    cold = pc.binary_join_element_wise(
        "org", s(repo_idx % 10), "/repo", s(repo_idx), ""
    )
    repos = pc.if_else(
        pa.array(key_id < cfg.hot_keys), pa.scalar("org0/monorepo"), cold
    )
    paths = pc.binary_join_element_wise(
        "src/d",
        s((key_id // 97) % 31),
        "/m",
        s((key_id // 7) % 13),
        "/file_",
        s(key_id),
        ".",
        pa.array(EXTS[lang_idx]),
        "",
    )
    langs = LANGS[lang_idx]
    return repos, paths, langs


def generate_changelog_tables(
    cfg: ChangelogConfig, lo: int = 0, hi: int | None = None
) -> list[pa.Table]:
    """Events with lsn in [lo, hi), physically shaped per their version.

    Returns 1 or 2 tables (a v1-shaped one and/or a v2-shaped one) ordered
    by ``delivery_index`` inside each table — the physical delivery order
    differs from lsn order within ``cfg.ooo_window`` (out-of-order fixture).
    """
    import pandas as pd

    hi = cfg.num_events if hi is None else hi
    raw = _gen_range(cfg, lo, hi)
    lsn = raw["lsn"]
    n = len(lsn)
    key_id = raw["key_id"]
    repos, paths, langs = key_repo_path(key_id, cfg)

    # commit hex: one C hexlify over the big-endian u64 view, reshaped to
    # 16-char strings — replaces 1 format() call per event
    import binascii

    hex_bytes = binascii.hexlify(
        _splitmix64(lsn.astype(np.uint64)).astype(">u8").tobytes()
    )
    commit = pa.array(
        np.char.decode(np.frombuffer(hex_bytes, dtype="S16"), "ascii")
    )

    deletes = raw["is_delete"]
    del_mask = pa.array(deletes)
    op = pc.if_else(
        del_mask,
        pa.scalar("DELETE"),
        pc.if_else(
            pa.array(raw["is_insert"]), pa.scalar("INSERT"), pa.scalar("UPDATE")
        ),
    )

    filler = _FILLER
    flen = len(filler)
    lengths = raw["length"]
    # content = prefix + filler[start : start+length]; the variable-width
    # slice of the constant filler is ONE uint8 gather: per-row positions
    # (start_i + 0..len_i-1) via the repeat/cumsum trick, then the Arrow
    # string array is built directly on the gathered buffer — no Python
    # slicing, no object strings
    starts = (lsn % np.maximum(1, flen - lengths - 1)).astype(np.int64)
    eff = np.minimum(lengths, flen - starts)  # mirror Python clip slicing
    eff = np.where(deletes, 0, np.maximum(eff, 0))
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(eff, out=offsets[1:])
    # per-row slices are contiguous, so the right primitive is memcpy,
    # not a per-character index gather (indices cost 8 bytes of working
    # set per OUTPUT byte — measured 3× slower than this join). One
    # zero-copy memoryview slice per row, one C-level join, one buffer.
    mv = memoryview(_FILLER_BYTES)
    slice_vals = b"".join(
        [mv[s : s + e] for s, e in zip(starts.tolist(), eff.tolist())]
    )
    slices = pa.Array.from_buffers(
        pa.large_string(),
        n,
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(slice_vals)],
    )
    prefix = pc.binary_join_element_wise(
        "// ", repos, ":", paths, " @ lsn=", pc.cast(pa.array(lsn), pa.string()), "\n", ""
    )
    content = pc.cast(
        pc.binary_join_element_wise(
            pc.cast(prefix, pa.large_string()), slices, pa.scalar("", pa.large_string())
        ),
        pa.string(),
    )
    content = pc.if_else(del_mask, pa.scalar(None, pa.string()), content)

    v2_at = cfg.v2_boundary()
    version = np.where(lsn >= v2_at, np.int32(2), np.int32(1))

    # build full Arrow arrays ONCE, then zero-copy .take() per version/order
    full = {
        "lsn": pa.array(lsn),
        "op": op,
        "repo": repos,
        "path": paths,
        "commit": commit,
        "content": content,
        "schema_version": pa.array(version, type=pa.int32()),
        "delivery_index": pa.array(raw["delivery_index"]),
        "langs": pa.array(langs, type=pa.string()),
    }
    content_size_full = pc.cast(pc.utf8_length(full["content"]), pa.int64())

    out: list[pa.Table] = []
    for ver in (1, 2):
        mask = version == ver
        if not mask.any():
            continue
        idx = np.nonzero(mask)[0]
        # deliver in delivery_index order (out-of-order w.r.t. lsn)
        idx = pa.array(idx[np.argsort(raw["delivery_index"][idx], kind="stable")])
        cols = {name: full[name].take(idx) for name in full}
        if ver == 1:
            cols["lang"] = cols.pop("langs")
            schema = EVENT_SCHEMA_V1
        else:
            cols["language"] = cols.pop("langs")
            cols["content_size"] = content_size_full.take(idx)
            schema = EVENT_SCHEMA_V2
        out.append(pa.Table.from_arrays([cols[f.name] for f in schema], schema=schema))
    return out


def changelog_dataset(
    cfg: ChangelogConfig,
    *,
    override_num_blocks: int | None = None,
    lo: int = 0,
    hi: int | None = None,
):
    """Distributed deterministic changelog as a ``ray.data.Dataset``.

    ``ray.data.range`` provides the lsn counter; each task generates its own
    [lo, hi) slice independently (counter-based PRNG), so generation scales
    with the cluster and never materializes on the driver.
    """
    import ray.data as rd

    hi = cfg.num_events if hi is None else hi
    span = hi - lo
    n_blocks = override_num_blocks or max(8, span // 50_000)
    base = rd.range(span, override_num_blocks=n_blocks)
    offset = lo

    def gen(batch: pa.Table):
        ids = batch.column("id").to_numpy()
        b_lo, b_hi = int(ids.min()) + offset, int(ids.max()) + 1 + offset
        # range blocks are contiguous; assert to catch regressions
        assert b_hi - b_lo == len(ids), "range block not contiguous"
        yield from generate_changelog_tables(cfg, b_lo, b_hi)

    return base.map_batches(gen, batch_format="pyarrow", batch_size=None)
