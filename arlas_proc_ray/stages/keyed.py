"""Per-key, order-sensitive operators (the reference's window workhorse).

Every operator in the reference's §2.4 family is a Spark
``Window.partitionBy(id).orderBy(arlas_timestamp)`` expression (e.g.
/root/reference/src/main/scala/io/arlas/data/transform/features/
WithDuration.scala:34-58, timeseries/WithStateId.scala:38-60). Ray Data has
no window functions; the scale-correct mapping is:

    ds.map_batches(add _part_id = hash(keys) % P)      # cheap, vectorized
      .groupby(_part_id).map_groups(partition_fn)      # ONE shuffle, P groups

``partition_fn`` gets a whole hash partition (MANY keys) as one pandas
DataFrame, sorts it once by (keys…, order), and computes every per-key
lag/lead/cumsum with ``df.groupby(keys)`` VECTORIZED operations — pandas'
cython groupby runs across all keys at once. This beats the naive
``groupby(key).map_groups`` (one Python call per key, millions of tiny
groups) by orders of magnitude and is the pattern reused by every keyed
operator below.

Partition count P is the DataModel's single partitioning decision; the same
key always lands in the same partition (stable siphash), so chained keyed
operators could be fused into one partition pass (see ``chain`` param).
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

from arlas_proc_ray.functions.hashing import partition_ids
from arlas_proc_ray.model import DataModel

PART_COL = DataModel.PARTITION_COL

_ARROW_STR = pd.ArrowDtype(pa.string())


def byte_exact_group_cols(pdf: pd.DataFrame, cols: Sequence[str]) -> pd.DataFrame:
    """Make string grouping columns byte-exact for pandas groupby.

    pandas' object-dtype string factorization (StringHashTable) hashes with
    C-string semantics and MERGES keys that differ only by NUL bytes
    (``''`` vs ``'\\x00'``), which disagrees with ``partition_ids`` /
    Arrow / DuckDB byte-exact equality. Arrow-backed string columns
    factorize through ``pa.compute.dictionary_encode`` (byte-exact), so
    object string key columns are converted in place before any partition
    fn runs its ``pdf.groupby(keys)``.
    """
    for k in cols:
        s = pdf[k]
        if s.dtype == object and pd.api.types.infer_dtype(s, skipna=True) in (
            "string",
            "empty",
        ):
            pdf[k] = s.astype(_ARROW_STR)
    return pdf


def restore_object_cols(pdf: pd.DataFrame, cols: Sequence[str]) -> pd.DataFrame:
    """Convert Arrow-backed string columns back to object dtype.

    Ray's pandas-block schema inference cannot type ``string[pyarrow]``
    columns (``pa.from_numpy_dtype`` fails → the column types as null),
    so every partition fn output must leave the frame with plain object
    strings. Values round-trip byte-exactly (``astype(object)`` keeps
    NUL bytes).
    """
    for k in cols:
        if k in pdf.columns and isinstance(pdf[k].dtype, pd.ArrowDtype):
            pdf[k] = pdf[k].astype(object)
    return pdf


def key_as_str(s: pd.Series) -> pd.Series:
    """Coerce a key column to plain-object str for derived-id concatenation.

    ``Series.astype(str)`` on an Arrow-backed string drops a lone NUL
    (``'\\x00'`` → ``''``); ``astype(object)`` round-trips every byte.
    """
    if pd.api.types.is_string_dtype(s.dtype):
        return s.astype(object)
    return s.astype(str)


# Process-wide default for keyed_partition_map's exchange= when a call
# site does not choose. "staged" (two-phase raw-task exchange) wins on
# WALL TIME at every single-box volume measured — through 20M scalar
# rows and 5M rows × 1KB payloads (tools/exchange_crossover.py curves in
# BASELINE.md; full catalog 151.8 → 99.2 s at sf0.1/32 cpus) — but it
# MATERIALIZES the upstream and ships blocks×P small objects, so at
# cluster scale (thousands of blocks × hundreds of partitions over
# multi-node object stores) the streaming sort shuffle's bounded memory
# and single all-to-all win; "sort" therefore stays the library default.
# The query catalog (pipelines/queries.py) opts into "staged" at import
# — catalog executions are bounded, single-job volumes where the
# materialization is cheap. Explicit exchange= at a call site always
# wins over this default.
DEFAULT_EXCHANGE = "sort"


def set_default_exchange(mode: str) -> None:
    """Set the process-wide exchange default ("sort" | "staged")."""
    global DEFAULT_EXCHANGE
    if mode not in ("sort", "staged"):
        raise ValueError(f"unknown exchange: {mode!r}")
    DEFAULT_EXCHANGE = mode


def keyed_partition_map(
    ds,
    *,
    keys: Sequence[str],
    order_col: str,
    fn: Callable[[pd.DataFrame], pd.DataFrame] | None = None,
    num_partitions: int = 64,
    presorted: bool = False,
    chain: Sequence[Callable[[pd.DataFrame], pd.DataFrame]] | None = None,
    exchange: str | None = None,
):
    """Hash-partition by ``keys`` and run ``fn`` per partition, sorted.

    ``fn`` sees all rows of a partition sorted by (keys…, order_col) and
    must be vectorized across keys (use ``pdf.groupby(list(keys))``).

    ``chain``: a SEQUENCE of partition fns fused into ONE shuffle — the
    same key always lands in the same partition, so N chained keyed
    operators need only one exchange instead of N. Results are identical
    to applying each op as its own ``keyed_partition_map``: the partition
    is re-sorted by (keys…, order_col) before every chained fn, exactly
    as the sequential version would (an in-memory mergesort, ~free next
    to the shuffle it replaces). Mutually exclusive with ``fn``.

    ``exchange``: ``None`` (default) resolves to the process-wide
    ``DEFAULT_EXCHANGE`` ("sort" unless ``set_default_exchange`` opted the
    process into "staged" — the query catalog does). ``"sort"`` routes through Ray Data's
    sort-based groupby — streaming, no materialization. ``"staged"``
    routes through the same two-phase raw-task exchange the CDC engine
    uses for high-volume epochs (cdc/staged.py rationale): one split
    task per input block (ONE argsort + per-partition ``take``), one
    gather task per partition — no sort machinery, no sampling, at the
    cost of materializing the upstream once. Two semantic differences,
    both documented: partition fns may be called on 0-row input (the
    sort path never materializes empty groups — fns here already return
    typed empties), and the fn must return a pa.Table or a pandas frame
    convertible to one with a schema CONSTANT across partitions.
    """
    keys = list(keys)
    if (fn is None) == (chain is None):
        raise ValueError("pass exactly one of fn= or chain=")
    fns = [fn] if fn is not None else list(chain)
    if exchange is None:
        exchange = DEFAULT_EXCHANGE
    if exchange not in ("sort", "staged"):
        raise ValueError(f"unknown exchange: {exchange!r}")
    if exchange == "staged":
        return _staged_keyed_map(
            ds,
            keys=keys,
            order_col=order_col,
            fns=fns,
            num_partitions=num_partitions,
            presorted=presorted,
        )

    def add_part(batch: pa.Table) -> pa.Table:
        pids = partition_ids(batch, keys, num_partitions)
        batch = batch.append_column(PART_COL, pa.array(pids, type=pa.int32()))
        # pandas-origin schemas carry a metadata dict that breaks Ray's
        # schema hashing in the sort reduce (cosmetic warning spam that can
        # mask real schema drift) — strip it before the shuffle
        return batch.replace_schema_metadata(None)

    def run_group(pdf: pd.DataFrame):
        pdf = byte_exact_group_cols(pdf.drop(columns=[PART_COL]), keys)
        for i, f in enumerate(fns):
            if isinstance(pdf, pa.Table):  # chained fn returned Arrow
                pdf = pdf.to_pandas()
            if not (presorted and i == 0):
                pdf = pdf.sort_values(keys + [order_col], kind="mergesort")
            pdf = f(pdf)
        if isinstance(pdf, pa.Table):
            # Arrow passthrough: partition fns may return typed-empty
            # pa.Tables (Ray's pandas block sizing can't handle
            # zero-length object columns)
            return pdf
        return restore_object_cols(pdf.reset_index(drop=True), pdf.columns)

    return (
        ds.map_batches(add_part, batch_format="pyarrow", batch_size=None)
        .groupby(PART_COL)
        .map_groups(run_group, batch_format="pandas")
    )


def _staged_keyed_map(ds, *, keys, order_col, fns, num_partitions, presorted):
    """Two-phase raw-task exchange behind ``keyed_partition_map``.

    Mirrors cdc/staged.py: split each resident block into P slices with
    one argsort + per-partition ``take()`` (NOT ``slice()`` — a pyarrow
    slice pickles the whole parent buffer, a P× blow-up through the
    object store), then one gather task per partition concatenates its
    slices and runs the partition fns. blocks×P small objects; use for
    volumes where the Dataset sort's sample/sort/re-block overhead
    dominates (the CDC engine's measured crossover is ~1M rows).
    """
    import ray
    import ray.data as rd

    P = num_partitions
    mat = ds.materialize()
    # drop 0-row blocks from metadata alone (no fetch): Ray 2.49 passes
    # empty blocks through map stages carrying a STALE upstream schema
    # (the RefBundle empty-schema artifact) — routing one through split
    # would KeyError on the key columns. All-empty input falls back to
    # the sort path, which resolves the output schema the normal way.
    block_refs = []
    for bundle in mat.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if meta.num_rows is None or meta.num_rows > 0:
                block_refs.append(ref)
    if not block_refs:
        return keyed_partition_map(
            mat,
            keys=keys,
            order_col=order_col,
            fn=fns[0] if len(fns) == 1 else None,
            chain=None if len(fns) == 1 else fns,
            num_partitions=P,
            presorted=presorted,
            exchange="sort",
        )

    @ray.remote(num_returns=P)
    def split(block):
        # internal refs are raw blocks — pandas when the upstream stage
        # ran in pandas batch format (to_arrow_refs would have converted)
        if isinstance(block, pd.DataFrame):
            block = pa.Table.from_pandas(block, preserve_index=False)
        block = block.combine_chunks()
        pids = partition_ids(block, keys, P)
        order = np.argsort(pids, kind="stable")
        bounds = np.searchsorted(pids[order], np.arange(P + 1))
        parts = [
            block.take(pa.array(order[bounds[p] : bounds[p + 1]]))
            for p in range(P)
        ]
        return tuple(parts) if P > 1 else parts[0]

    @ray.remote
    def gather(part: int, *slices: pa.Table) -> pa.Table:
        t = pa.concat_tables(slices, promote_options="default")
        pdf = byte_exact_group_cols(t.to_pandas(), keys)
        for i, f in enumerate(fns):
            if isinstance(pdf, pa.Table):
                pdf = pdf.to_pandas()
            if not (presorted and i == 0):
                pdf = pdf.sort_values(keys + [order_col], kind="mergesort")
            pdf = f(pdf)
        if isinstance(pdf, pa.Table):
            return pdf
        # strip the b'pandas' schema metadata: a metadata-carrying schema
        # is UNHASHABLE, which defeats Ray's schema dedup in every
        # downstream shuffle (one warning per block)
        return pa.Table.from_pandas(
            restore_object_cols(pdf.reset_index(drop=True), pdf.columns),
            preserve_index=False,
        ).replace_schema_metadata(None)

    split_out = [split.remote(ref) for ref in block_refs]
    out_refs = [
        gather.remote(
            p, *([s[p] for s in split_out] if P > 1 else split_out)
        )
        for p in range(P)
    ]
    return rd.from_arrow_refs(out_refs)


def staged_partition_apply(
    ds,
    *,
    num_partitions: int,
    fn: Callable[[int, pd.DataFrame], pd.DataFrame | pa.Table],
    empty_result: pa.Table | None = None,
    part_col: str = "_part",
):
    """Two-phase raw-task exchange on a PRECOMPUTED partition-id column.

    The caller has already routed every row (an int32 ``part_col`` in
    [0, num_partitions)); all that remains is a fixed-fan-out exchange —
    no ordering, no sampling — so the Dataset sort-groupby's machinery
    is pure overhead (measured ~1.4 s to route 1200 rows to 8
    partitions). One split task per resident block (ONE argsort +
    per-partition ``take()``, NOT ``slice()`` — a pyarrow slice pickles
    the whole parent buffer), one gather task per partition running
    ``fn(p, pdf)``.

    ``empty_result``: when given, gathers whose partition received zero
    rows return it WITHOUT calling ``fn`` — the incremental contract
    (untouched partitions cost nothing). When ``None``, ``fn`` runs for
    every partition, zero-row input included (bootstrap: every partition
    must come into existence).

    Returns a Dataset with one block per partition. ``fn`` results must
    share one schema; pandas results are converted (metadata-stripped).
    """
    import ray
    import ray.data as rd

    P = num_partitions
    mat = ds.materialize()
    # drop 0-row blocks from metadata alone — Ray 2.49 passes empty
    # blocks through map stages with a stale upstream schema (the
    # RefBundle artifact); routing one through split would KeyError on
    # the part column.
    block_refs = []
    for bundle in mat.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if meta.num_rows is None or meta.num_rows > 0:
                block_refs.append(ref)

    def _to_table(res) -> pa.Table:
        if isinstance(res, pa.Table):
            return res
        return pa.Table.from_pandas(
            res.reset_index(drop=True), preserve_index=False
        ).replace_schema_metadata(None)

    if not block_refs:
        if empty_result is not None:
            return rd.from_arrow(empty_result)

        @ray.remote
        def run_empty(p: int) -> pa.Table:
            return _to_table(fn(p, None))

        return rd.from_arrow_refs([run_empty.remote(p) for p in range(P)])

    @ray.remote(num_returns=P)
    def split(block):
        if isinstance(block, pd.DataFrame):
            block = pa.Table.from_pandas(
                block, preserve_index=False
            ).replace_schema_metadata(None)
        block = block.combine_chunks()
        pids = np.asarray(block.column(part_col).to_numpy(), np.int64)
        order = np.argsort(pids, kind="stable")
        bounds = np.searchsorted(pids[order], np.arange(P + 1))
        parts = [
            block.take(pa.array(order[bounds[p]: bounds[p + 1]]))
            for p in range(P)
        ]
        return tuple(parts) if P > 1 else parts[0]

    @ray.remote
    def gather(p: int, *slices: pa.Table):
        live = [s for s in slices if s.num_rows]
        if not live and empty_result is not None:
            return empty_result
        pdf = (
            pa.concat_tables(live, promote_options="default").to_pandas()
            if live else None
        )
        return _to_table(fn(p, pdf))

    split_out = [split.remote(ref) for ref in block_refs]
    return rd.from_arrow_refs([
        gather.remote(
            p, *([s[p] for s in split_out] if P > 1 else split_out)
        )
        for p in range(P)
    ])


# ---------------------------------------------------------------------------
# §2.4 operators — each is a partition_fn factory + a Dataset-level wrapper.
# All assume the partition_fn contract above (sorted by keys+order).
# ---------------------------------------------------------------------------


def with_duration(ds, *, keys, order_col, ts_col, target="duration_s", num_partitions=64):
    """Seconds since the previous observation of the same key (lag diff).

    Reference: WithDuration (features/WithDuration.scala:34-58) — lag(ts,1)
    over the id window. First row of each key gets null.
    """
    keys = list(keys)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        prev = pdf.groupby(keys, sort=False)[ts_col].shift(1)
        delta = pdf[ts_col] - prev
        pdf[target] = (
            delta.dt.total_seconds()
            if hasattr(delta, "dt") and hasattr(delta.dt, "total_seconds")
            else delta
        )
        return pdf

    return keyed_partition_map(
        ds, keys=keys, order_col=order_col, fn=fn, num_partitions=num_partitions
    )


def with_lag_lead(
    ds, *, keys, order_col, col, lag_target=None, lead_target=None, num_partitions=64
):
    """Generic lag/lead of one column over the key window."""
    keys = list(keys)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.groupby(keys, sort=False)[col]
        if lag_target:
            pdf[lag_target] = g.shift(1)
        if lead_target:
            pdf[lead_target] = g.shift(-1)
        return pdf

    return keyed_partition_map(
        ds, keys=keys, order_col=order_col, fn=fn, num_partitions=num_partitions
    )


def state_id_fn(keys: list[str], order_col: str, state_col: str, target: str):
    """Segment-id assignment on state change (vectorized run-length encode).

    Reference: WithStateIdOnStateChangeOrUnique
    (timeseries/WithStateIdOnStateChangeOrUnique.scala:35-54) + WithStateId
    forward-fill (timeseries/WithStateId.scala:38-60): a new segment starts
    whenever the state differs from its lag; the segment id is
    ``<key>#<order value of the segment's first row>``.
    """

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.groupby(keys, sort=False)
        changed = (pdf[state_col] != g[state_col].shift(1)) | (
            g.cumcount() == 0
        )
        seg = changed.cumsum()  # globally increasing — unique per run
        first_order = pdf[order_col].groupby(seg).transform("first")
        key_str = key_as_str(pdf[keys[0]])
        for k in keys[1:]:
            key_str = key_str + "/" + key_as_str(pdf[k])
        pdf[target] = key_str + "#" + first_order.astype(str)
        return pdf

    return fn


def with_state_id_on_change(
    ds, *, keys, order_col, state_col, target, num_partitions=64
):
    keys = list(keys)
    return keyed_partition_map(
        ds,
        keys=keys,
        order_col=order_col,
        fn=state_id_fn(keys, order_col, state_col, target),
        num_partitions=num_partitions,
    )


def fragments_fn(keys: list[str], order_col: str, ts_col: str, value_col: str):
    """Adjacent-pair mapper: observations → movement fragments.

    Reference: FlowFragmentMapper (fragments/FlowFragmentMapper.scala:39-227)
    — for each consecutive pair of rows of the same key emit one fragment
    row carrying id ``key#prevOrder_order``, duration, deltas and pair
    means; each key's FIRST row is dropped (`:186`).
    """

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.groupby(keys, sort=False)
        prev_ts = g[ts_col].shift(1)
        prev_v = g[value_col].shift(1)
        prev_ord = g[order_col].shift(1)
        first = prev_ts.isna()

        delta = pdf[ts_col] - prev_ts
        dur = (
            delta.dt.total_seconds()
            if hasattr(delta, "dt") and hasattr(delta.dt, "total_seconds")
            else delta
        )
        key_str = key_as_str(pdf[keys[0]])
        for k in keys[1:]:
            key_str = key_str + "/" + key_as_str(pdf[k])

        out = pdf.copy()
        out["fragment_id"] = (
            key_str
            + "#"
            + prev_ord.astype("Int64").astype(str)
            + "_"
            + pdf[order_col].astype(str)
        )
        out["duration_s"] = dur
        out["value_delta"] = pdf[value_col] - prev_v
        out["value_avg"] = (pdf[value_col] + prev_v) / 2.0
        out["nb_points"] = 2
        return out[~first.values]

    return fn


def with_fragments(
    ds, *, keys, order_col, ts_col, value_col, num_partitions=64
):
    keys = list(keys)
    return keyed_partition_map(
        ds,
        keys=keys,
        order_col=order_col,
        fn=fragments_fn(keys, order_col, ts_col, value_col),
        num_partitions=num_partitions,
    )


def with_sample_id(
    ds, *, keys, order_col, duration_col, sampling: float, target="sample_id", num_partitions=64
):
    """Running-sum bucketing of fragments into ≈``sampling``-long samples.

    Reference: WithFragmentSampleId (features/WithFragmentSampleId.scala:38-65):
    ``floor((cumsum(duration)-1)/sampling) - floor((duration-1)/sampling)``
    per key — reproduced exactly (it makes buckets begin at each long row).
    """
    keys = list(keys)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        cum = pdf.groupby(keys, sort=False)[duration_col].cumsum()
        pdf[target] = np.floor((cum - 1) / sampling) - np.floor(
            (pdf[duration_col] - 1) / sampling
        )
        return pdf

    return keyed_partition_map(
        ds, keys=keys, order_col=order_col, fn=fn, num_partitions=num_partitions
    )


def with_duration_from_id(
    ds, *, keys, group_col, ts_col, target="group_duration_s", num_partitions=64, order_col=None
):
    """Broadcast last(ts)−first(ts) of each sub-group to its rows.

    Reference: WithDurationFromId (features/WithDurationFromId.scala:36-54)
    — unbounded window over rows sharing an id.
    """
    keys = list(keys)
    order_col = order_col or ts_col

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = byte_exact_group_cols(pdf, [group_col])
        g = pdf.groupby(group_col, sort=False)[ts_col]
        span = g.transform("max") - g.transform("min")
        pdf[target] = (
            span.dt.total_seconds()
            if hasattr(span, "dt") and hasattr(span.dt, "total_seconds")
            else span
        )
        return pdf

    return keyed_partition_map(
        ds, keys=keys, order_col=order_col, fn=fn, num_partitions=num_partitions
    )


def rolling_median_outlier_fn(
    keys: list[str], value_col: str, half_window: int, threshold: float,
    med_target: str = "rolling_median", flag_target: str = "is_outlier",
):
    """Hampel-style local outlier detection per key.

    Reference: LocalOutliersRemover (filter/LocalOutliersRemover.scala:40-98)
    — sliding ±halfWindow collect_list → median → |value − median| >
    threshold ⇒ outlier. Window is truncated at key edges (same as the
    reference's collect_list over bounded window).
    """

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        med = (
            pdf.groupby(keys, sort=False)[value_col]
            .rolling(window=2 * half_window + 1, center=True, min_periods=1)
            .median()
            .reset_index(drop=True)
        )
        med.index = pdf.index
        pdf[med_target] = med
        pdf[flag_target] = (pdf[value_col] - med).abs() > threshold
        return pdf

    return fn


def with_rolling_median_outlier(
    ds, *, keys, order_col, value_col, half_window=2, threshold=0.5, num_partitions=64
):
    keys = list(keys)
    return keyed_partition_map(
        ds,
        keys=keys,
        order_col=order_col,
        fn=rolling_median_outlier_fn(keys, value_col, half_window, threshold),
        num_partitions=num_partitions,
    )


def with_visibility_change(
    ds, *, keys, order_col, visibility_col, target="visibility_change", num_partitions=64
):
    """APPEAR / DISAPPEAR / APPEAR_DISAPPEAR from lag+lead of a 0/1 column.

    Reference: WithVisibilityChange (features/WithVisibilityChange.scala:41-76):
    a visible row after an invisible (or first) one APPEARs; a visible row
    before an invisible (or last) one DISAPPEARs; both ⇒ APPEAR_DISAPPEAR.
    """
    keys = list(keys)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.groupby(keys, sort=False)[visibility_col]
        prev, nxt = g.shift(1), g.shift(-1)
        vis = pdf[visibility_col] > 0
        appear = vis & ((prev.isna()) | (prev == 0))
        disappear = vis & ((nxt.isna()) | (nxt == 0))
        out = np.select(
            [appear & disappear, appear, disappear],
            ["APPEAR_DISAPPEAR", "APPEAR", "DISAPPEAR"],
            default=None,
        )
        pdf[target] = out
        return pdf

    return keyed_partition_map(
        ds, keys=keys, order_col=order_col, fn=fn, num_partitions=num_partitions
    )


def static_columns_standardizer_fn(keys: list[str], spec: dict[str, tuple]):
    """Fill a whole key-group with its first valid value, else a default.

    Reference: StaticColumnsStandardizer (tools/StaticColumnsStandardizer.scala:37-55):
    per id, "undefined" sentinels → null, then every row gets the group's
    first non-null value or the declared default.

    ``spec``: {column: (undefined_sentinel, default)}.
    """

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        for col, (sentinel, default) in spec.items():
            s = pdf[col].mask(pdf[col] == sentinel)
            first = s.groupby([pdf[k] for k in keys], sort=False).transform("first")
            pdf[col] = first.fillna(default)
        return pdf

    return fn


def sessionize_fn(
    keys: list[str], order_col: str, ts_col: str, gap_s: float, target: str = "session_id"
):
    """Session windows: a new session starts after a gap > ``gap_s``.

    The reference encodes sessionization as fixed-threshold gap detection
    (WithGapState, features/WithGapState.scala:35-48) followed by state-id
    assignment; this fuses both into one pass. ``session_id`` =
    ``<key>#<order value of session's first row>``.
    """

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.groupby(keys, sort=False)
        prev = g[ts_col].shift(1)
        delta = pdf[ts_col] - prev
        dur = (
            delta.dt.total_seconds()
            if hasattr(delta, "dt") and hasattr(delta.dt, "total_seconds")
            else delta
        )
        new_session = prev.isna() | (dur > gap_s)
        seg = new_session.cumsum()
        first_order = pdf[order_col].groupby(seg).transform("first")
        key_str = key_as_str(pdf[keys[0]])
        for k in keys[1:]:
            key_str = key_str + "/" + key_as_str(pdf[k])
        pdf[target] = key_str + "#" + first_order.astype(str)
        return pdf

    return fn


def with_session_id(ds, *, keys, order_col, ts_col, gap_s, num_partitions=64):
    keys = list(keys)
    return keyed_partition_map(
        ds,
        keys=keys,
        order_col=order_col,
        fn=sessionize_fn(keys, order_col, ts_col, gap_s),
        num_partitions=num_partitions,
    )


def dedup_keep_first(ds, *, keys, order_col, num_partitions=64):
    """Exact dedup on key columns keeping the smallest order value.

    Reference: DataFrameFormatter's dedup on (id, timestamp)
    (tools/DataFrameFormatter.scala:48).
    """
    keys = list(keys)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf.drop_duplicates(subset=keys, keep="first")

    return keyed_partition_map(
        ds, keys=keys, order_col=order_col, fn=fn, num_partitions=num_partitions
    )
