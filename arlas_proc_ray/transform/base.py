"""Transform protocol + Pipeline — the user-extension surface.

Mirror of the reference's transformer chaining: users subclass
``ArlasTransformer`` (declaring ``requiredCols``; ``transformSchema``
validates the incoming schema and appends output fields) and chain stages
with ``df.process(t1, t2, …)``
(/root/reference/src/main/scala/io/arlas/data/transform/ArlasTransformer.scala:27-55,
/root/reference/src/main/scala/io/arlas/data/sql/TransformableDataFrame.scala:53-61).

Here a ``Transform`` declares ``required_cols`` and ``added_fields``;
``Pipeline.run(ds)`` contract-checks the WHOLE chain eagerly against the
dataset's Arrow schema BEFORE any execution (the reference only discovers a
missing column when Spark's fit() reaches that stage), then folds the
transforms into one lazy ``ray.data.Dataset`` chain for the streaming
executor.

Three concrete shapes cover the reference's operator surface:
- ``BatchTransform``   — stateless vectorized ``map_batches`` (tasks);
- ``KeyedTransform``   — per-key ordered logic run partition-grouped (ONE
  hash shuffle, vectorized across all keys of a partition — see
  stages/keyed.py);
- a callable CLASS passed as ``BatchTransform(cls, concurrency=…)`` — an
  actor pool for stateful stages (models, lookup tables).
"""

from __future__ import annotations

from typing import Callable, Sequence

import pyarrow as pa


class SchemaContractError(Exception):
    """A stage's required columns are absent at its position in the chain.

    Analogue of the reference's ``DataFrameException``
    (ArlasTransformer.scala:42-50,58).
    """


class Transform:
    """Base: declare the contract, implement ``apply``."""

    #: columns that must exist in the incoming schema
    required_cols: tuple[str, ...] = ()
    #: fields this transform appends (for eager chain checking)
    added_fields: tuple[pa.Field, ...] = ()
    #: columns this transform removes
    dropped_cols: tuple[str, ...] = ()

    def check_schema(self, names: set[str]) -> set[str]:
        missing = [c for c in self.required_cols if c not in names]
        if missing:
            raise SchemaContractError(
                f"{type(self).__name__}: missing required columns {missing}; "
                f"incoming: {sorted(names)}"
            )
        names = names | {f.name for f in self.added_fields}
        return names - set(self.dropped_cols)

    def apply(self, ds):  # ray.data.Dataset -> ray.data.Dataset
        raise NotImplementedError


class BatchTransform(Transform):
    """Stateless (fn) or stateful-actor-pool (class) ``map_batches`` stage."""

    def __init__(
        self,
        fn: Callable | type,
        *,
        required_cols: Sequence[str] = (),
        added_fields: Sequence[pa.Field] = (),
        dropped_cols: Sequence[str] = (),
        batch_format: str = "pyarrow",
        batch_size: int | None = None,
        concurrency=None,
        num_cpus: float | None = None,
        fn_constructor_kwargs: dict | None = None,
    ):
        self.fn = fn
        self.required_cols = tuple(required_cols)
        self.added_fields = tuple(added_fields)
        self.dropped_cols = tuple(dropped_cols)
        # batch_size always explicit: None = whole blocks (the default —
        # Ray's 1024-row "default" batches starve vectorized kernels)
        self._kwargs: dict = {
            "batch_format": batch_format,
            "batch_size": batch_size,
        }
        if concurrency is not None:
            self._kwargs["concurrency"] = concurrency
        if num_cpus is not None:
            self._kwargs["num_cpus"] = num_cpus
        if fn_constructor_kwargs:
            self._kwargs["fn_constructor_kwargs"] = fn_constructor_kwargs

    def apply(self, ds):
        return ds.map_batches(self.fn, **self._kwargs)


class KeyedTransform(Transform):
    """Per-key, order-sensitive logic (the reference's window surface).

    ``group_fn(pdf)`` receives ONE HASH PARTITION (many keys) as a pandas
    DataFrame already sorted by ``(keys…, order_col)`` and returns a
    DataFrame; implement per-key logic with ``pdf.groupby(keys)`` vectorized
    operations — never a Python loop over keys.
    """

    def __init__(
        self,
        group_fn: Callable,
        *,
        keys: Sequence[str],
        order_col: str,
        required_cols: Sequence[str] = (),
        added_fields: Sequence[pa.Field] = (),
        dropped_cols: Sequence[str] = (),
        num_partitions: int = 64,
    ):
        self.group_fn = group_fn
        self.keys = list(keys)
        self.order_col = order_col
        self.required_cols = tuple(required_cols) or tuple(self.keys) + (order_col,)
        self.added_fields = tuple(added_fields)
        self.dropped_cols = tuple(dropped_cols)
        self.num_partitions = num_partitions

    def apply(self, ds):
        from arlas_proc_ray.stages.keyed import keyed_partition_map

        return keyed_partition_map(
            ds,
            keys=self.keys,
            order_col=self.order_col,
            fn=self.group_fn,
            num_partitions=self.num_partitions,
        )


class Pipeline:
    """Eagerly contract-checked chain of transforms over one Dataset."""

    def __init__(self, *transforms: Transform):
        self.transforms = list(transforms)

    def validate(self, schema: pa.Schema) -> None:
        names = set(schema.names)
        for t in self.transforms:
            names = t.check_schema(names)

    def validate_names(self, names) -> None:
        ns = set(names)
        for t in self.transforms:
            ns = t.check_schema(ns)

    def run(self, ds):
        schema = ds.schema()
        if schema is not None:
            # Ray's Schema.types may hold non-Arrow types for pandas-object
            # blocks; the contract check only needs the NAMES
            self.validate_names(schema.names)
        for t in self.transforms:
            ds = t.apply(ds)
        return ds
