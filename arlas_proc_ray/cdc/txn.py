"""Cross-table atomic commit records — multi-table snapshot isolation.

``demux_epoch`` (cdc/demux.py) fans one multiplexed changelog out to many
per-table engines, each with its own fenced epoch. Per-table commits are
exactly-once, but they land one after another: a reader that joins table A
to table B while a demux run is mid-flight can see A at epoch e and B at
e-1 — a torn cut. The same problem Iceberg/Nessie solve with multi-table
transactions (published designs) is solved here with ONE atomic record:

    txn_dir/txn-<id>.json   = {"txn": id, "tables": {name: epoch}}

written (tmp + fsync + rename, the store's marker discipline) only after
EVERY table's epoch committed. Readers that need a consistent cut resolve
``TxnLog.cut()`` — the newest complete record — and pin every per-table
read to its epoch (``engine.final_state(epoch=...)`` / ``store.scan(...)``:
epoch time travel already exists). A crash after some tables committed
leaves the record unwritten, so consistent readers keep the previous cut
(no torn read); the demux rerun is a per-table resume that finishes the
rest and then publishes the record.

Idempotence / concurrency: re-recording an identical cut is a no-op (the
rerun path); a DIFFERENT cut under the same txn id raises
``ConcurrentTxnError`` (two writers racing different content must not
silently overwrite — same contract as the snapshot store's
optimistic-concurrency fence).

Retention: ``vacuum`` keeps tagged epoch chains, not txn records — tag the
epochs a long-lived cut must outlive, or keep txn retention inside the
vacuum window.
"""

from __future__ import annotations

import json
import os
import tempfile


class ConcurrentTxnError(RuntimeError):
    """A txn id was recorded twice with different table cuts."""


class TxnLog:
    def __init__(self, txn_dir: str):
        self.txn_dir = txn_dir
        os.makedirs(txn_dir, exist_ok=True)

    def _path(self, txn_id: int) -> str:
        return os.path.join(self.txn_dir, f"txn-{int(txn_id):012d}.json")

    def record(self, txn_id: int, tables: dict[str, int]) -> dict:
        """Atomically publish {table: epoch} as transaction ``txn_id``."""
        rec = {"txn": int(txn_id), "tables": {k: int(v) for k, v in tables.items()}}
        path = self._path(txn_id)
        if os.path.exists(path):
            existing = self.read(txn_id)
            if existing == rec:
                return rec  # idempotent rerun
            raise ConcurrentTxnError(
                f"txn {txn_id} already recorded with a different cut: "
                f"{existing['tables']} != {rec['tables']}"
            )
        fd, tmp = tempfile.mkstemp(dir=self.txn_dir, suffix=".json.tmp")
        try:
            with os.fdopen(fd, "w") as f:
                f.write(json.dumps(rec, sort_keys=True))
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
        return rec

    def read(self, txn_id: int) -> dict | None:
        path = self._path(txn_id)
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def list_txns(self) -> list[int]:
        out = []
        for name in os.listdir(self.txn_dir):
            if name.startswith("txn-") and name.endswith(".json"):
                out.append(int(name[4:-5]))
        return sorted(out)

    def latest(self) -> dict | None:
        ids = self.list_txns()
        return self.read(ids[-1]) if ids else None

    def cut(self, txn_id: int | None = None) -> dict[str, int]:
        """{table: epoch} for ``txn_id`` (default: the newest complete txn).

        Every epoch in the cut is fully committed by construction — pin
        per-table reads to these epochs for a consistent multi-table view.
        """
        rec = self.latest() if txn_id is None else self.read(txn_id)
        if rec is None:
            raise LookupError(
                f"no committed transaction{'' if txn_id is None else f' {txn_id}'} "
                f"in {self.txn_dir}"
            )
        return dict(rec["tables"])


def consistent_final_states(engines: dict, txn_log: TxnLog, txn_id=None) -> dict:
    """One snapshot-isolated ``final_state`` table per engine.

    Reads every table AT the cut's epoch (time travel), never "latest" —
    immune to demux runs committing underneath the reader.
    """
    cut = txn_log.cut(txn_id)
    return {
        name: engines[name].final_state(epoch=cut[name])
        for name in sorted(cut)
        if name in engines
    }
