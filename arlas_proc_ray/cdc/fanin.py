"""Watermark-cut fan-in of sharded change feeds.

A sharded upstream (per-shard WALs, Debezium topic partitions) delivers
one logical change log as K individually-ordered but mutually SKEWED
source feeds — one shard can lag whole epochs behind the others. The
engine's exactly-once fence drops any event at or below a partition's
applied ``last_lsn`` (cdc/engine.py apply contract) — that is exactly
what makes epoch re-application idempotent after a crash — so epochs
must be GLOBALLY LSN-monotone: feeding skewed shards straight in lets a
lagging shard's genuinely-new low-LSN events arrive below an
already-advanced watermark and be silently dropped as replay
duplicates. Both behaviors are pinned in
tests/test_fanin_invariance.py.

:func:`fanin_cut` is the standard fix (the same move as Kafka consumer
group offsets / Flink's min-over-inputs watermark): an epoch may carry
exactly the events with ``prev_cut < lsn ≤ W`` where ``W = min`` over
sources of the high-water mark each source has durably DELIVERED.
Everything above W stays in the sources' spools for a later epoch.

Scale shape: the cut itself is pure metadata — one int per source on
the driver, nothing buffers driver-side. Event rows stream through one
vectorized lsn-range filter per source Dataset plus a lazy union; the
per-source Datasets are whatever the caller's spool serves (the
directory tailer's parquet-bytes segments, a read_parquet over spool
files, a decoded wire feed), re-servable by range exactly like
cdc/tailer.py's two-phase file cursor.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def fanin_cut(
    sources: dict,
    highwater: dict,
    *,
    prev_cut: int = -1,
    lsn_col: str = "lsn",
):
    """One consistent epoch from K skewed source feeds.

    ``sources`` maps source name → Dataset of change events (any engine
    schema version, each ordered or not — only the range filter cares);
    ``highwater`` maps the SAME names → the highest lsn that source has
    durably delivered so far (its spool cursor). Returns
    ``(epoch_ds, new_cut)`` with ``epoch_ds`` carrying exactly the rows
    ``prev_cut < lsn ≤ new_cut`` across all sources, or ``(None,
    prev_cut)`` when no source progress is cuttable yet (the lagging
    shard gates the watermark — correctness over freshness).

    Applying each returned epoch in order keeps every partition's
    applied-lsn watermark monotone, so the engine's idempotency fence
    never mistakes late shard data for replay duplicates.

    Closed-source convention: a source that has reached end-of-stream
    must report the GLOBAL max (conceptually +∞) as its high-water —
    otherwise its last own lsn gates W forever and the other shards'
    tail events never cut (pinned in the drain test).
    """
    if set(sources) != set(highwater):
        raise ValueError("sources and highwater must cover the same keys")
    if not sources:
        return None, prev_cut
    w = min(int(v) for v in highwater.values())
    if w <= prev_cut:
        return None, prev_cut

    lo, hi = prev_cut, w

    def in_range(t: pa.Table) -> pa.Table:
        col = t.column(lsn_col)
        return t.filter(
            pc.and_(pc.greater(col, lo), pc.less_equal(col, hi))
        )

    out = None
    for name in sorted(sources):
        sl = sources[name].map_batches(
            in_range, batch_format="pyarrow", batch_size=None
        )
        out = sl if out is None else out.union(sl)
    return out, w
