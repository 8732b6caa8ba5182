"""Stateless vectorized per-batch operators (SURVEY.md §2.2).

All are pure ``pyarrow.compute`` / numpy kernels intended for
``ds.map_batches(fn, batch_format="pyarrow")`` — zero-copy from the object
store, no Python per-row work.
"""

from __future__ import annotations

import re
from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def lower_snake_case_columns(table: pa.Table) -> pa.Table:
    """Normalize column names to lower_snake_case.

    Reference: DataFrameFormatter.withFormattedColumnNames
    (tools/DataFrameFormatter.scala:80-93).
    """

    def norm(name: str) -> str:
        s = re.sub(r"[^0-9a-zA-Z]+", "_", name)
        s = re.sub(r"(?<=[a-z0-9])(?=[A-Z])", "_", s)
        return s.lower().strip("_")

    return table.rename_columns([norm(n) for n in table.column_names])


def repair_doubles(table: pa.Table, cols: Sequence[str]) -> pa.Table:
    """Cast string-typed numeric columns to float64, fixing ``","`` decimals.

    Reference: DataFrameFormatter's double repair incl. comma→dot fix
    (tools/DataFrameFormatter.scala:63-75). Unparseable values → null
    (the reference nulls them too).
    """
    for c in cols:
        col = table.column(c)
        if pa.types.is_floating(col.type):
            continue
        fixed = pc.replace_substring(col.cast(pa.string()), ",", ".")
        # invalid strings -> null instead of raising (no arrow kernel for
        # try-parse; pandas to_numeric(coerce) is vectorized C)
        import pandas as pd

        as_f64 = pa.array(
            pd.to_numeric(pd.Series(fixed.to_pandas()), errors="coerce"),
            type=pa.float64(),
        )
        table = table.set_column(
            table.schema.get_field_index(c), c, as_f64
        )
    return table


def parse_timestamp(
    table: pa.Table,
    src_col: str,
    fmt: str = "%Y-%m-%dT%H:%M:%S",
    target: str = "ts_epoch",
) -> pa.Table:
    """Datetime-string column → epoch-seconds int64 (null on parse failure).

    Reference: WithStandardTimestamp (features/WithStandardTimestamp.scala:33-64)
    — UDF parse with UTC fallback, null on failure. Here: vectorized
    ``pc.strptime(..., error_is_null=True)``.
    """
    parsed = pc.strptime(
        table.column(src_col).cast(pa.string()), format=fmt, unit="s",
        error_is_null=True,
    )
    epoch = pc.cast(parsed, pa.int64())
    return table.append_column(target, epoch)


def with_time_partition(
    table: pa.Table, ts_col: str, target: str = "time_partition"
) -> pa.Table:
    """yyyyMMdd int storage-partition column from a timestamp column.

    Reference: WithTimePartition (features/WithTimePartition.scala:34-47);
    the reference partitions its Parquet store daily by this value
    (ArlasTransformerColumns.scala:26-29).
    """
    ts = table.column(ts_col)
    if pa.types.is_integer(ts.type):  # epoch seconds
        ts = pc.cast(pc.multiply(ts.cast(pa.int64()), 1_000_000), pa.timestamp("us"))
    part = pc.cast(pc.strftime(ts, format="%Y%m%d"), pa.string())
    return table.append_column(target, pc.cast(part, pa.int32()))


def filter_value_range(
    table: pa.Table, col: str, lo: float, hi: float
) -> pa.Table:
    """Keep rows with lo <= col <= hi (null drops).

    Reference: WithoutOutOfRangeLocation (filter/WithoutOutOfRangeLocation.scala:36-55).
    """
    c = table.column(col)
    mask = pc.and_(pc.greater_equal(c, pa.scalar(lo)), pc.less_equal(c, pa.scalar(hi)))
    return table.filter(pc.fill_null(mask, False))


def with_threshold_label(
    table: pa.Table,
    col: str,
    threshold: float,
    above_label: str,
    below_label: str,
    target: str,
    null_label: str | None = None,
) -> pa.Table:
    """Row-wise ``value > threshold ? above : below`` labeling.

    Covers the reference's family of fixed-threshold conditionals:
    WithGapState (features/WithGapState.scala:35-48, default 43200 s),
    WithVisibilityProportion (features/WithVisibilityProportion.scala:35-48,
    1800 s), course timeout (features/WithCourseOrStop.scala:35, 600 s).
    """
    c = table.column(col)
    lab = pc.if_else(
        pc.greater(c, pa.scalar(float(threshold))),
        pa.scalar(above_label),
        pa.scalar(below_label),
    )
    if null_label is not None:
        lab = pc.fill_null(lab, null_label)
    return table.append_column(target, lab)


def with_empty_col(table: pa.Table, name: str, dtype: pa.DataType) -> pa.Table:
    """Add an all-null column of a given type.

    Reference: withEmptyCol (sql/TransformableDataFrame.scala:63-64).
    """
    return table.append_column(name, pa.nulls(table.num_rows, dtype))


def with_nested_struct(
    table: pa.Table, target: str, children: dict[str, str]
) -> pa.Table:
    """Build a struct column from existing columns ({field: source_col}).

    Reference: withColumnsNested recursive struct builder
    (sql/WritableDataFrame.scala:35-62).
    """
    arrays = [table.column(src).combine_chunks() for src in children.values()]
    arrays = [
        a.chunk(0) if isinstance(a, pa.ChunkedArray) and a.num_chunks == 1 else a
        for a in arrays
    ]
    struct = pa.StructArray.from_arrays(arrays, names=list(children.keys()))
    return table.append_column(target, struct)


def pick_by_duration(
    table: pa.Table,
    duration_col: str,
    threshold: float,
    short_col: str,
    long_col: str,
    target: str,
) -> pa.Table:
    """duration <= threshold ? short_col : long_col (per row).

    Reference: WithGpsOrSensorSpeed (features/WithGpsOrSensorSpeed.scala:38-60)
    — pick gps- vs sensor-derived speed by gap duration.
    """
    cond = pc.less_equal(table.column(duration_col), pa.scalar(float(threshold)))
    chosen = pc.if_else(cond, table.column(short_col), table.column(long_col))
    return table.append_column(target, chosen)


def with_tempo_proportions(
    table: pa.Table,
    tempo_col: str,
    proportion_map: dict[str, str],
    target_is_multi: str = "tempo_is_multi",
) -> pa.Table:
    """One-hot tempo proportion columns (1.0 for the predicted tempo, 0.0
    otherwise) + an is-multi flag initialised false.

    Reference: WithTempoProportions (features/WithTempoProportions.scala:37-52)
    — initial fragments span two observations, so exactly one tempo is
    represented; downstream fragment summaries duration-weight-average
    these columns (FragmentSummaryTransformer.scala:274-289) and re-elect
    the main tempo (see ``stages.summarize.elect_main_tempo``).

    ``proportion_map``: {proportion_column_name: tempo_value}.
    """
    tempo = table.column(tempo_col)
    for col_name, value in proportion_map.items():
        one = pc.if_else(
            pc.equal(tempo, pa.scalar(value)),
            pa.scalar(1.0),
            pa.scalar(0.0),
        )
        table = table.append_column(col_name, one)
    return table.append_column(
        target_is_multi, pa.array(np.zeros(table.num_rows, dtype=bool))
    )


def as_es_data(
    table: pa.Table,
    *,
    lat_col: str,
    lon_col: str,
    id_col: str,
    ts_col: str,
    geopoint_target: str = "arlas_geo_point",
    id_target: str = "arlas_id",
) -> pa.Table:
    """Project a frame for indexed storage: "lat,lon" geo-point string and
    a "<id>#<timestamp>" unique row id.

    Reference: asArlasEsData (sql/WritableDataFrame.scala:78-81).
    """
    s = lambda c: pc.cast(table.column(c), pa.string())  # noqa: E731
    geo = pc.binary_join_element_wise(s(lat_col), s(lon_col), ",")
    rid = pc.binary_join_element_wise(s(id_col), s(ts_col), "#")
    return table.append_column(geopoint_target, geo).append_column(
        id_target, rid
    )
