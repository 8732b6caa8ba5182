"""Versioned Arrow schema registry + batch alignment (schema evolution).

The reference's schema system is contract-checked, additive and dynamic:
every transformer declares required columns and appends its outputs, and
``transformSchema`` validates each stage against the incoming schema
(/root/reference/src/main/scala/io/arlas/data/transform/ArlasTransformer.scala:27-50).

Here that is formalized for a CDC stream (BASELINE.json north_star): change
events carry a ``schema_version``; the registry versions ``pyarrow.Schema``s
with rename maps between versions, and ``align_table`` casts any batch to
the latest version — renames are zero-copy (Arrow column rename does not
touch buffers), missing columns are null-filled, and casts only run when
types actually differ.

A singleton ``SchemaRegistryActor`` is the authoritative copy when versions
are registered mid-stream; stages capture an immutable snapshot
(`registry.snapshot()`) in their closure so the hot path never does an actor
round-trip per batch.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa

import ray


class SchemaEvolutionError(Exception):
    """Raised when a batch cannot be aligned to the target schema.

    Analogue of the reference's ``DataFrameException`` on missing required
    columns (ArlasTransformer.scala:42-50,58).
    """


@dataclass
class SchemaVersion:
    version: int
    schema: pa.Schema
    # column renames applied when upgrading FROM this version to the next
    # e.g. {"lang": "language"} for v1 -> v2
    renames_to_next: dict[str, str] = field(default_factory=dict)


class SchemaRegistry:
    """Plain (non-actor) versioned schema registry.

    Keeps an ordered map version -> SchemaVersion. ``rename_map(v)`` composes
    the renames from version v all the way to the latest version.
    """

    def __init__(self) -> None:
        self._versions: dict[int, SchemaVersion] = {}

    def register(
        self,
        version: int,
        schema: pa.Schema,
        renames_to_next: dict[str, str] | None = None,
    ) -> None:
        self._versions[version] = SchemaVersion(
            version, schema, dict(renames_to_next or {})
        )

    def versions(self) -> list[int]:
        return sorted(self._versions)

    @property
    def latest_version(self) -> int:
        if not self._versions:
            raise SchemaEvolutionError("registry is empty")
        return max(self._versions)

    @property
    def latest_schema(self) -> pa.Schema:
        return self._versions[self.latest_version].schema

    def get(self, version: int) -> SchemaVersion:
        try:
            return self._versions[version]
        except KeyError:
            raise SchemaEvolutionError(f"unknown schema_version {version}") from None

    def rename_map(self, from_version: int) -> dict[str, str]:
        """Composed old-name -> latest-name map from ``from_version``."""
        out: dict[str, str] = {}
        for v in sorted(self._versions):
            if v < from_version:
                continue
            step = self._versions[v].renames_to_next
            # apply step to existing targets, then add new renames
            out = {old: step.get(new, new) for old, new in out.items()}
            for old, new in step.items():
                if old not in out.values():
                    out.setdefault(old, new)
        return out

    def snapshot(self) -> "SchemaRegistry":
        """Immutable-by-convention copy for closure capture in stages."""
        cp = SchemaRegistry()
        cp._versions = {
            v: SchemaVersion(sv.version, sv.schema, dict(sv.renames_to_next))
            for v, sv in self._versions.items()
        }
        return cp

    # ---- batch alignment ------------------------------------------------

    def align_table(
        self, table: pa.Table, from_version: int | None = None
    ) -> pa.Table:
        """Cast ``table`` to the latest schema.

        Renames (zero-copy), drops unknown columns, null-fills missing ones,
        casts only columns whose type differs. If ``from_version`` is None
        the renames for every known version are attempted (a mixed batch is
        first split by its ``schema_version`` column by the caller).
        """
        target = self.latest_schema
        renames = (
            self.rename_map(from_version)
            if from_version is not None
            else self.rename_map(min(self._versions))
        )
        if renames:
            # When an upstream block unification already added the target
            # column (null-filled), coalesce old into it instead of renaming
            # (a mixed-version batch has BOTH `lang` and `language`).
            for old, new in renames.items():
                if old in table.column_names and new in table.column_names:
                    import pyarrow.compute as pc

                    merged = pc.coalesce(table.column(new), table.column(old))
                    table = table.set_column(
                        table.schema.get_field_index(new), new, merged
                    ).drop_columns([old])
            new_names = [renames.get(n, n) for n in table.column_names]
            table = table.rename_columns(new_names)

        cols: list[pa.ChunkedArray] = []
        n = table.num_rows
        for f in target:
            if f.name in table.column_names:
                col = table.column(f.name)
                if col.type != f.type:
                    col = col.cast(f.type)
                cols.append(col)
            else:
                cols.append(pa.chunked_array([pa.nulls(n, f.type)]))
        return pa.Table.from_arrays(cols, schema=target)


@ray.remote(num_cpus=0)
class SchemaRegistryActor:
    """Authoritative registry when schema versions appear mid-stream.

    num_cpus=0: it only answers plan-time / version-miss calls, never the
    per-batch hot path.
    """

    def __init__(self) -> None:
        self._reg = SchemaRegistry()

    def register(self, version, schema_bytes, renames_to_next=None) -> None:
        schema = pa.ipc.read_schema(pa.BufferReader(schema_bytes))
        self._reg.register(version, schema, renames_to_next)

    def snapshot_bytes(self) -> bytes:
        """Serialized snapshot (schemas as IPC) for worker-side rebuild."""
        import pickle

        payload = {
            v: (sv.schema.serialize().to_pybytes(), sv.renames_to_next)
            for v, sv in self._reg._versions.items()
        }
        return pickle.dumps(payload)


def registry_from_snapshot_bytes(blob: bytes) -> SchemaRegistry:
    import pickle

    reg = SchemaRegistry()
    for v, (schema_bytes, renames) in pickle.loads(blob).items():
        reg.register(v, pa.ipc.read_schema(pa.BufferReader(schema_bytes)), renames)
    return reg
