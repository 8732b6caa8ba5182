"""Epoch sizing against the object-store budget — the ~4×-bytes rule.

Measured on this class of box (BASELINE.md round-3 high-volume addendum):
the staged exchange holds ≈4× the epoch's byte volume in flight
(generation blocks + L1 slices + L2 slices + merge inputs). Once that
passes the plasma budget Ray spills to disk and throughput falls off a
cliff, not a slope — 40M events (~10 GB) ran 162 s where 2×20M ran
37.7 s on a 37.6 GB store. The operative rule:

    size epochs so  AMPLIFICATION × epoch_bytes ≤ HEADROOM × object_store

This module makes the rule executable instead of documentation:

  * ``plan_epoch_chunks(epoch_bytes)`` — decide whether an epoch fits,
    and if not, how to split it (strategy + chunk count). Pure function
    of (bytes, budget) so the decision is unit-testable.
  * ``lsn_cutpoints(refs, k)`` — block-strided LSN quantiles (the same
    sampling shape as stages/joins.py's global range-join bounds: every
    block contributes, never a ``limit()`` prefix) giving k-1 cut values
    whose half-open ranges ``(lo, hi]`` partition the LSN domain. Chunk
    boundaries MUST be LSN-valued: the per-partition fence drops
    ``lsn <= watermark``, so a later chunk may only carry strictly
    higher LSNs or its events would be dropped as already-applied.
  * ``auto_epoch_bytes()`` — the byte cadence for ``tail(...,
    epoch_every_events="auto")``.

Used by ``CdcEngine.apply_epoch_staged`` (cdc/engine.py) to auto-split
oversized epochs into LSN-range sub-epochs, and by
``MergeActorPool.tail`` (cdc/actors.py) for the auto commit cadence.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

# In-flight byte amplification of the staged exchange, measured
# (BASELINE.md round-3 high-volume addendum).
AMPLIFICATION = 4.0
# Fraction of the object store the engine lets one epoch's exchange
# occupy — the rest is everybody else (snapshot reads, other datasets).
HEADROOM = 0.85
# In-memory chunked apply additionally pins the full materialized input
# (1×) plus one chunk's filtered copy (1/K) on top of the exchange's
# AMPLIFICATION/K — see plan_epoch_chunks.
_INMEM_PER_CHUNK = AMPLIFICATION + 1.0


def object_store_bytes(default: int = 2 * 1024**3) -> int:
    """Total object-store bytes of the current Ray cluster (all nodes).

    ``ray.cluster_resources()['object_store_memory']`` is the cluster-wide
    plasma capacity in bytes. Falls back to ``default`` when Ray is not
    initialised (pure-local unit tests).
    """
    try:
        import ray

        if ray.is_initialized():
            v = ray.cluster_resources().get("object_store_memory")
            if v:
                return int(v)
    except Exception:
        pass
    return int(default)


def max_epoch_bytes(budget_bytes: int | None = None) -> int:
    """Largest epoch byte volume the 4×-rule admits without splitting."""
    b = budget_bytes if budget_bytes is not None else object_store_bytes()
    return int(b * HEADROOM / AMPLIFICATION)


def auto_epoch_bytes(budget_bytes: int | None = None) -> int:
    """Byte cadence for ``tail(epoch_every_events="auto")`` — same rule."""
    return max_epoch_bytes(budget_bytes)


@dataclass(frozen=True)
class EpochPlan:
    """Sizing decision for one epoch. ``strategy``:

    * ``"single"``  — fits; apply as-is (chunks == 1).
    * ``"inmem"``   — split into ``chunks`` LSN ranges filtered out of the
      pinned materialized input (fast path: no extra I/O). Budget model:
      pinned input (1×) + one chunk copy (1/K) + exchange (4×/K) must fit,
      i.e. ``bytes·(1 + 5/K) ≤ HEADROOM·budget`` — solvable iff
      ``2·bytes ≤ HEADROOM·budget``.
    * ``"scratch"`` — input too large to stay pinned during the applies:
      stream it to a chunk-partitioned parquet scratch once, release the
      input, then apply each chunk from disk (only ``4×/K`` in flight).
    """

    strategy: str
    chunks: int
    epoch_bytes: int
    budget_bytes: int


def plan_epoch_chunks(
    epoch_bytes: int, budget_bytes: int | None = None
) -> EpochPlan:
    """Pure sizing decision — unit-tested against canned numbers."""
    budget = budget_bytes if budget_bytes is not None else object_store_bytes()
    allow = budget * HEADROOM
    if AMPLIFICATION * epoch_bytes <= allow:
        return EpochPlan("single", 1, epoch_bytes, budget)
    if 2 * epoch_bytes <= allow:
        # pinned(1) + chunk(1/K) + exchange(4/K) ≤ allow
        k = math.ceil(
            _INMEM_PER_CHUNK * epoch_bytes / (allow - epoch_bytes)
        )
        return EpochPlan("inmem", max(2, k), epoch_bytes, budget)
    k = math.ceil(AMPLIFICATION * epoch_bytes / allow)
    return EpochPlan("scratch", max(2, k), epoch_bytes, budget)


# ---------------------------------------------------------------- LSN chunks


def lsn_cutpoints(
    block_refs, k: int, *, samples_per_block: int = 512
) -> list[int]:
    """k-1 LSN cut values from block-strided samples of every block.

    Each block contributes an evenly-strided sample of its ``lsn`` column
    (every block, never a prefix — skewed block order must not bias the
    cuts), the driver takes global quantiles, and the resulting integer
    cutpoints define half-open chunk ranges ``(c[i-1], c[i]]``. Degenerate
    quantiles (heavy ties) are deduplicated, so fewer than k-1 cuts — and
    thus fewer, larger chunks — are possible on pathological LSN
    distributions; callers must iterate over ``len(cuts)+1`` chunks.
    """
    import ray

    @ray.remote(num_cpus=0.25)
    def sample(t: pa.Table) -> np.ndarray:
        a = t.column("lsn").to_numpy(zero_copy_only=False)
        if len(a) <= samples_per_block:
            return a.astype(np.int64)
        stride = len(a) // samples_per_block
        return a[::stride].astype(np.int64)

    parts = [p for p in ray.get([sample.remote(r) for r in block_refs]) if len(p)]
    if not parts or k <= 1:
        return []  # empty input (or no split): one chunk covers everything
    allv = np.concatenate(parts)
    qs = np.quantile(allv.astype(np.float64), np.linspace(0, 1, k + 1)[1:-1])
    cuts = np.unique(np.floor(qs).astype(np.int64))
    return [int(c) for c in cuts]


def lsn_range_refs(block_refs, lo: int | None, hi: int | None) -> list:
    """One filter task per block → refs of the rows with
    ``lo < lsn <= hi`` (None = unbounded). Empty slices are kept (typed),
    so the chunk dataset always has ≥1 block per input block."""
    import pyarrow.compute as pc
    import ray

    @ray.remote
    def cut(t: pa.Table) -> pa.Table:
        mask = None
        if lo is not None:
            mask = pc.greater(t.column("lsn"), pa.scalar(lo, pa.int64()))
        if hi is not None:
            m2 = pc.less_equal(t.column("lsn"), pa.scalar(hi, pa.int64()))
            mask = m2 if mask is None else pc.and_(mask, m2)
        out = t if mask is None else t.filter(mask)
        return out.combine_chunks()

    return [cut.remote(r) for r in block_refs]
