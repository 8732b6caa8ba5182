"""Structuring-column declaration for keyed, ordered pipelines.

Mirror of the reference's ``DataModel`` (names of the structuring columns:
id / timestamp / lat / lon — /root/reference/src/main/scala/io/arlas/data/
model/DataModel.scala:22-26). Everything else in a row is open metadata;
transforms add columns to whatever arrives.

For the CDC engine the key is the composite ``(repo, path)`` and the order
column is the ``lsn`` (commit-ordered log sequence number); for the
movement-analogue pipelines over the ``events`` table the key is
``user_id`` and the order column ``ts`` / ``event_id``.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class DataModel:
    """Names the structuring columns of a keyed, ordered table.

    key_cols:   entity identity — all per-key ordered operators partition by
                this (reference: ``Window.partitionBy(dataModel.idColumn)``).
    order_col:  total order within a key (reference: ``arlas_timestamp``;
                CDC: ``lsn``).
    num_partitions: hash-partition fan-out used by keyed operators. This is
                the ONE partitioning decision reused across stages so a
                pipeline shuffles once, not once per stage.
    """

    key_cols: tuple[str, ...] = ("repo", "path")
    order_col: str = "lsn"
    num_partitions: int = 64
    # Optional extra structuring columns (movement-analogue pipelines).
    timestamp_col: str | None = None
    extra: dict = field(default_factory=dict)

    PARTITION_COL = "_part_id"

    @property
    def key_list(self) -> list[str]:
        return list(self.key_cols)
