"""Time-window aggregates: tumbling and sliding (hopping) windows.

Ray Data has no window-aggregate operator; both shapes express as a
vectorized window-id assignment followed by the standard partial→final
aggregation (one small shuffle of pre-combined partials — the same
combiner-first design as everything else here):

- **tumbling**: each row belongs to exactly one ``width``-sized window
  (``floor(ts / width)``) — a plain keyed aggregation on (keys, window).
- **sliding**: windows of ``width`` every ``slide`` (hop); a row belongs
  to ``ceil(width / slide)`` consecutive windows, emitted by a vectorized
  repeat (the fan-out factor is width/slide — keep it small, as every
  streaming engine does).

Aggregations accept the same exact-arithmetic discipline as the query
catalog: integer-cents sums for money columns stay bit-identical to SQL.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

from arlas_proc_ray.stages.keyed import keyed_partition_map


def _window_start_us(ts_us: np.ndarray, width_us: int, origin_us: int) -> np.ndarray:
    return origin_us + ((ts_us - origin_us) // width_us) * width_us


def tumbling_window_agg(
    ds,
    *,
    keys: Sequence[str],
    ts_col: str,
    width_s: float,
    agg: dict[str, tuple[str, str]],
    origin_us: int = 0,
    num_partitions: int = 16,
):
    """Aggregate per (keys…, tumbling window). ``agg`` as in pandas:
    {out: (src, how)} with how ∈ sum/min/max/mean/count/first/last.
    Output carries ``window_start`` (timestamp, µs)."""
    keys = list(keys)
    width_us = int(round(width_s * 1_000_000))

    def assign(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col)
        ts_us = pa.compute.cast(ts, pa.timestamp("us")).cast(pa.int64()).to_numpy()
        start = _window_start_us(ts_us, width_us, origin_us)
        return batch.append_column(
            "window_start", pa.array(start).cast(pa.timestamp("us"))
        ).replace_schema_metadata(None)

    assigned = ds.map_batches(assign, batch_format="pyarrow", batch_size=None)
    group = keys + ["window_start"]

    def final(pdf: pd.DataFrame) -> pd.DataFrame:
        gb = pdf.groupby(group, sort=False)
        pieces = {}
        for out, (src, how) in agg.items():
            pieces[out] = gb[src].agg(how)
        return pd.DataFrame(pieces).reset_index()

    return keyed_partition_map(
        assigned, keys=group, order_col=ts_col, fn=final,
        num_partitions=num_partitions,
    )


def sliding_window_agg(
    ds,
    *,
    keys: Sequence[str],
    ts_col: str,
    width_s: float,
    slide_s: float,
    agg: dict[str, tuple[str, str]],
    origin_us: int = 0,
    num_partitions: int = 16,
):
    """Aggregate per (keys…, sliding window of ``width`` every ``slide``).

    A row with timestamp t belongs to every window whose start lies in
    ``(t - width, t]`` on the slide grid — emitted via one vectorized
    repeat per batch (fan-out = ceil(width/slide)).
    """
    keys = list(keys)
    width_us = int(round(width_s * 1_000_000))
    slide_us = int(round(slide_s * 1_000_000))
    fanout = -(-width_us // slide_us)  # ceil

    def explode(batch: pa.Table) -> pa.Table:
        ts = pa.compute.cast(batch.column(ts_col), pa.timestamp("us"))
        ts_us = ts.cast(pa.int64()).to_numpy()
        n = len(ts_us)
        # last slide-grid window start containing t
        last_start = origin_us + ((ts_us - origin_us) // slide_us) * slide_us
        offsets = (np.arange(fanout) * slide_us)[None, :]
        starts = last_start[:, None] - offsets  # (n, fanout)
        valid = ts_us[:, None] < starts + width_us
        idx = np.repeat(np.arange(n), fanout)[valid.ravel()]
        win = starts.ravel()[valid.ravel()]
        out = batch.take(pa.array(idx))
        return out.append_column(
            "window_start", pa.array(win).cast(pa.timestamp("us"))
        ).replace_schema_metadata(None)

    exploded = ds.map_batches(explode, batch_format="pyarrow", batch_size=None)
    group = keys + ["window_start"]

    def final(pdf: pd.DataFrame) -> pd.DataFrame:
        gb = pdf.groupby(group, sort=False)
        pieces = {}
        for out, (src, how) in agg.items():
            pieces[out] = gb[src].agg(how)
        return pd.DataFrame(pieces).reset_index()

    return keyed_partition_map(
        exploded, keys=group, order_col=ts_col, fn=final,
        num_partitions=num_partitions,
    )


def resample_ffill(
    ds,
    *,
    keys: Sequence[str],
    ts_col: str,
    step_s: float,
    value_cols: Sequence[str],
    grid_col: str = "gts",
    num_partitions: int = 64,
):
    """Gap-filled keyed resampling: one row per fixed grid tick per key,
    carrying the LAST observation at-or-before the tick (forward fill).

    The grid for each key spans ``[ceil(min_ts/step), floor(max_ts/step)]``
    — every tick therefore has at least one observation at-or-before it,
    so no row is ever null-filled. The classic time-series regularization
    step (sensor streams → fixed cadence) Ray Data has no operator for.

    Scale shape: ONE hash co-partition on ``keys`` (the same exchange as
    every keyed op), then a fully vectorized merge-and-fill per partition:
    grid ticks are generated by repeat/arange from per-key segment bounds,
    events and ticks are lexsorted together (tick AFTER event at equal
    timestamp ⇒ as-of ``>=`` semantics), and one ``maximum.accumulate``
    pass assigns each tick its source row — no per-key Python loop. The
    output fan-out is span/step rows per key; pick ``step_s`` so that a
    key's grid fits a partition alongside its events.
    """
    keys = list(keys)
    value_cols = [c for c in value_cols if c not in keys and c != ts_col]
    step_us = int(round(step_s * 1e6))
    if step_us <= 0:
        raise ValueError("step_s must be positive")

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            out = {k: pdf[k] for k in keys}
            out[grid_col] = pd.Series([], dtype="datetime64[us]")
            for c in value_cols:
                out[c] = pdf[c]
            return pd.DataFrame(out)
        ts = pdf[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        code = pdf.groupby(keys, sort=False).ngroup().to_numpy()
        n_e = len(ts)
        first = np.r_[True, code[1:] != code[:-1]]
        seg_start = np.flatnonzero(first)
        seg_end = np.r_[seg_start[1:], n_e] - 1
        k0 = -(-ts[seg_start] // step_us)  # ceil
        k1 = ts[seg_end] // step_us  # floor
        cnt = np.maximum(k1 - k0 + 1, 0)
        n_g = int(cnt.sum())
        seg_idx = np.repeat(np.arange(len(seg_start)), cnt)
        offs = np.arange(n_g) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        gts = (k0[seg_idx] + offs) * step_us

        comb_key = np.concatenate([code, code[seg_start][seg_idx]])
        comb_ts = np.concatenate([ts, gts])
        is_grid = np.concatenate(
            [np.zeros(n_e, np.int8), np.ones(n_g, np.int8)]
        )
        order = np.lexsort((is_grid, comb_ts, comb_key))
        # event rows carry their own row index; ticks carry -1 — a running
        # max assigns every tick the latest event at-or-before it (always
        # same-key: the first tick of a key is >= that key's first event)
        src = np.where(is_grid == 0, np.arange(n_e + n_g), -1)
        last_evt = np.maximum.accumulate(src[order])
        gmask = is_grid[order] == 1
        evt_idx = last_evt[gmask]
        out = pdf.iloc[evt_idx][keys + value_cols].reset_index(drop=True)
        out.insert(
            len(keys),
            grid_col,
            pd.Series(comb_ts[order][gmask].astype("datetime64[us]")),
        )
        return out

    return keyed_partition_map(
        ds, keys=keys, order_col=ts_col, fn=fn, num_partitions=num_partitions
    )


_DAY_US = 86_400_000_000


def time_in_state_per_day(
    ds,
    *,
    keys,
    ts_col: str,
    state_col: str,
    num_partitions: int = 16,
):
    """Seconds spent in each state per UTC calendar day.

    Each observation opens an interval [ts_i, ts_{i+1}) in its state
    (each key's last observation closes nothing — standard
    state-duration semantics, the WithDuration convention,
    transform/timeseries/WithDurationFromId.scala analogue applied to
    wall-clock reporting). Intervals crossing midnight are SPLIT at day
    boundaries with a vectorized ragged explode (np.repeat + arange —
    fan-out is bounded by days spanned, like the sliding-window
    fan-out), every overlap is exact integer microseconds, and partials
    combine per (day, state) before one tiny keyed exchange.

    Returns (day TIMESTAMP at UTC midnight, state, total_s DOUBLE =
    exact µs/1e6)."""

    keys = list(keys)

    def intervals(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.groupby(keys, sort=False)
        start_all = (
            pdf[ts_col].astype("datetime64[us]").to_numpy().view("int64")
        )
        end_dt = g[ts_col].shift(-1)
        m = end_dt.notna().to_numpy()
        # int64 µs view, never float (µs epochs exceed 2^53); NaT slots
        # view as INT64_MIN but are masked out
        e = end_dt.to_numpy().astype("datetime64[us]").view("int64")[m]
        s = start_all[m]
        st = pdf[state_col].to_numpy(object)[m]

        d0 = s // _DAY_US
        d1 = (e - 1) // _DAY_US  # end exclusive: an exact-midnight end
        n_days = (d1 - d0 + 1).astype(np.int64)  # adds nothing to that day
        idx = np.repeat(np.arange(len(s)), n_days)
        # day offset within each interval: global arange minus each run's
        # start (the standard ragged-explode trick, stages/chunking.py)
        run_starts = np.concatenate([[0], np.cumsum(n_days)[:-1]])
        day = d0[idx] + (np.arange(idx.size) - run_starts[idx])
        lo = np.maximum(s[idx], day * _DAY_US)
        hi = np.minimum(e[idx], (day + 1) * _DAY_US)
        part = pd.DataFrame(
            {"day_idx": day, "state": st[idx], "us": hi - lo}
        )
        out = part.groupby(["day_idx", "state"], sort=False, as_index=False)[
            "us"
        ].sum()
        out["us"] = out["us"].astype(np.int64)
        return out

    # pass 1 MUST see each key's rows together and time-ordered (a plain
    # map_batches would drop every interval crossing a batch boundary):
    # one keyed exchange on the entity, partials collapse to (day, state)
    # rows inside the partition
    partials = keyed_partition_map(
        ds, keys=keys, order_col=ts_col, fn=intervals,
        num_partitions=num_partitions,
    )

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf.groupby(["day_idx", "state"], sort=False, as_index=False)[
            "us"
        ].sum()
        day = pd.to_datetime(out.pop("day_idx") * _DAY_US, unit="us")
        out.insert(0, "day", day.astype("datetime64[us]"))
        out["total_s"] = out.pop("us") / 1e6
        return out

    return keyed_partition_map(
        partials, keys=["day_idx"], order_col="us", fn=merge,
        num_partitions=num_partitions,
    )


def throttle_events(
    ds,
    *,
    keys: Sequence[str],
    ts_col: str,
    min_gap_us: int,
    order_cols: Sequence[str] = (),
    num_partitions: int = 16,
):
    """Debounce filter: drop rows closer than ``min_gap_us`` to their
    per-key PREDECESSOR (``lag`` semantics — the gap is measured to the
    previous row in (ts, *order_cols) order whether or not that row was
    itself kept; the chained keep-anchored variant is sessionization's
    job, stages/keyed.py). The standard rate-limit/debounce shape of
    every streaming engine, as a batch operator: one keyed co-partition
    exchange, then a vectorized groupby-shift-diff inside the partition.

    ``order_cols`` breaks timestamp ties deterministically (pass the
    row id). First row per key is always kept.
    """
    from arlas_proc_ray.stages.keyed import keyed_partition_map

    keys = list(keys)
    order_cols = list(order_cols)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(keys + [ts_col] + order_cols, kind="mergesort")
        ts_us = pdf[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        prev = (
            pd.Series(ts_us, index=pdf.index)
            .groupby([pdf[k] for k in keys], sort=False)
            .shift(1)
        )
        keep = prev.isna().to_numpy() | (
            ts_us - prev.fillna(0).to_numpy().astype(np.int64) > min_gap_us
        )
        return pdf[keep]

    order_col = order_cols[0] if order_cols else ts_col
    return keyed_partition_map(
        ds, keys=keys, order_col=order_col, fn=fn, num_partitions=num_partitions
    )


def cusum_alarm_points(
    ds,
    *,
    key_col: str,
    order_col: str,
    value_int_col: str,
    ref: int,
    threshold: int,
    num_partitions: int = 16,
):
    """One-sided CUSUM change-point alarms per key (Page 1954): over the
    key's ordered series, ``s_i = max(0, s_{i-1} + (v_i − ref))``; emit
    the rows where ``s`` first crosses ``threshold`` (upcrossings only —
    the detector stays armed until it falls back under).

    Exactness: the max(0,·) recurrence is computed CLOSED-FORM as
    ``s_i = c_i − min(0, min_{j≤i} c_j)`` with ``c`` the running sum of
    deviations — all int64 (callers pass a pre-scaled integer value
    column, e.g. cents), so a SQL window oracle (SUM + MIN OVER)
    reproduces every alarm bit-for-bit; no sequential Python loop, just
    three vectorized grouped scans per partition.

    Scale shape: one keyed exchange; output is alarm rows only.
    """
    import numpy as np

    def part(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf[key_col]
        d = pdf[value_int_col] - ref
        c = d.groupby(g, sort=False).cumsum()
        rmin = c.groupby(g, sort=False).cummin()
        s = c - np.minimum(rmin, 0)
        prev = s.groupby(g, sort=False).shift(1, fill_value=0)
        fire = (s > threshold) & (prev <= threshold)
        out = pdf.loc[fire, [key_col, order_col]].copy()
        out["cusum"] = s[fire].astype("int64")
        return out.reset_index(drop=True)

    return keyed_partition_map(
        ds, keys=[key_col], order_col=order_col, fn=part,
        num_partitions=num_partitions,
    )


def time_weighted_avg(
    ds,
    *,
    key_col: str,
    ts_col: str,
    order_col: str,
    value_int_col: str,
    bucket_us: int = 86_400_000_000,
    num_partitions: int = 16,
):
    """Time-weighted average per (key, tumbling time bucket): each
    observation is weighted by its holding time — the µs gap to the
    key's NEXT observation in the same bucket; the bucket's last
    observation carries no weight (no look-ahead across buckets). Rows
    with zero total holding time (single-observation buckets) are
    dropped, matching the SQL LEAD() formulation.

    Exactness: weights are int64 µs, values pre-scaled int64 (cents), so
    numerator/denominator sums are exact; the single final division is
    the only float op — bit-identical to the oracle's.

    Scale shape: one keyed exchange on ``key_col``; per partition two
    vectorized grouped passes (shift(−1) for the next timestamp, then a
    grouped sum); one output row per (key, bucket).
    """
    import numpy as np

    def part(pdf: pd.DataFrame) -> pd.DataFrame:
        # chronological order with a deterministic tiebreak (the exchange
        # sorts by (key, order_col); holding time is a TIME-order notion)
        pdf = pdf.sort_values([key_col, ts_col, order_col], kind="mergesort")
        ts_us = pdf[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        bucket = ts_us // bucket_us
        grp = [pdf[key_col], pd.Series(bucket, index=pdf.index)]
        nxt = pd.Series(ts_us, index=pdf.index).groupby(grp, sort=False).shift(-1)
        dur = nxt - ts_us
        keep = dur.notna()
        sub = pd.DataFrame(
            {
                key_col: pdf.loc[keep, key_col],
                "_bucket": bucket[keep.to_numpy()],
                "_w": (
                    pdf.loc[keep, value_int_col].to_numpy(np.int64)
                    * dur[keep].to_numpy(np.int64)
                ),
                "_d": dur[keep].to_numpy(np.int64),
            }
        )
        agg = (
            sub.groupby([key_col, "_bucket"], sort=False)[["_w", "_d"]]
            .sum()
            .reset_index()
        )
        agg = agg[agg["_d"] > 0]
        return pd.DataFrame(
            {
                key_col: agg[key_col].to_numpy(),
                "window_start": pd.to_datetime(
                    agg["_bucket"].to_numpy(np.int64) * bucket_us, unit="us"
                ),
                "twap": agg["_w"].to_numpy(np.int64)
                / agg["_d"].to_numpy(np.int64),
                "dur_us": agg["_d"].to_numpy(np.int64),
            }
        )

    return keyed_partition_map(
        ds, keys=[key_col], order_col=order_col, fn=part,
        num_partitions=num_partitions,
    )


def ema_last(
    ds,
    *,
    key_col: str,
    order_col: str,
    value_int_col: str,
    alpha_denom: int = 8,
    num_partitions: int = 16,
):
    """Final exponential moving average per key, in EXACT integer
    fixed-point: ``s_1 = v_1``, then
    ``s_i = ((d−1)·s_{i−1} + v_i + d//2) // d`` with ``d = alpha_denom``
    (α = 1/d, round-half-up) — deterministic and reproducible by a SQL
    recursive CTE, where a float EMA would drift.

    Vectorized as a jagged scan: one pass per SEQUENCE POSITION, each a
    numpy update across every key active at that position — total work
    O(rows), serial overhead O(longest key's sequence) per partition
    (the same bounded-sequence contract as the Viterbi windows in
    stages/ml.py:hmm_decode_fn; cap upstream if a key can be unbounded).
    One keyed exchange; one output row per key.
    """
    import numpy as np

    d = int(alpha_denom)
    half = d // 2

    def part(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame(
                {
                    key_col: pdf[key_col],
                    "n_events": pd.Series([], dtype="int64"),
                    "ema": pd.Series([], dtype="int64"),
                }
            )
        codes, uniques = pd.factorize(pdf[key_col], sort=False)
        rn = pdf.groupby(key_col, sort=False).cumcount().to_numpy()
        v = pdf[value_int_col].to_numpy(np.int64)
        order = np.argsort(rn, kind="stable")
        rs, cs, vs = rn[order], codes[order], v[order]
        s = np.zeros(len(uniques), dtype=np.int64)
        bounds = np.concatenate(
            [[0], np.flatnonzero(np.diff(rs)) + 1, [len(rs)]]
        )
        for bi in range(len(bounds) - 1):
            sel = slice(bounds[bi], bounds[bi + 1])
            c = cs[sel]
            if rs[bounds[bi]] == 0:
                s[c] = vs[sel]
            else:
                s[c] = ((d - 1) * s[c] + vs[sel] + half) // d
        counts = np.bincount(codes, minlength=len(uniques)).astype(np.int64)
        return pd.DataFrame(
            {key_col: uniques, "n_events": counts, "ema": s}
        )

    return keyed_partition_map(
        ds, keys=[key_col], order_col=order_col, fn=part,
        num_partitions=num_partitions,
    )


def trailing_range_agg(
    ds,
    *,
    key_col: str,
    ts_col: str,
    order_col: str,
    value_int_col: str | None = None,
    window_us: int,
    n_name: str = "trailing_n",
    sum_name: str = "trailing_sum",
    num_partitions: int = 16,
):
    """Per-ROW trailing value-range window (SQL ``RANGE BETWEEN <w>
    PRECEDING AND CURRENT ROW``): for every row, the count (and
    optionally the int64 sum) over the key's rows with
    ``ts ∈ [ts_row − window, ts_row]`` — peers at the same timestamp are
    all included, exactly the SQL RANGE frame (not ROWS).

    Vectorized with zero per-row work: within a partition sorted by
    (key, ts), timestamps are lifted to a per-key disjoint axis
    (``ts + key_code · span``, spans exceeding the window so keys can't
    bleed), then TWO global searchsorted calls find each row's window
    bounds and a prefix-sum difference yields the sums — O(n log n) per
    partition, no Python loop. One keyed exchange.
    """
    import numpy as np

    def part(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([key_col, ts_col, order_col], kind="mergesort")
        ts = pdf[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        if len(ts) == 0:
            out = pdf[[key_col, order_col]].copy()
            out[n_name] = pd.Series([], dtype="int64")
            if value_int_col is not None:
                out[sum_name] = pd.Series([], dtype="int64")
            return out
        codes = pdf.groupby(key_col, sort=False).ngroup().to_numpy(np.int64)
        span = np.int64(ts.max() - ts.min() + window_us + 1)
        lifted = (ts - ts.min()) + codes * span  # globally sorted
        lo = np.searchsorted(lifted, lifted - window_us, side="left")
        hi = np.searchsorted(lifted, lifted, side="right")
        out = pdf[[key_col, order_col]].copy()
        out[n_name] = (hi - lo).astype(np.int64)
        if value_int_col is not None:
            ps = np.concatenate(
                [[0], np.cumsum(pdf[value_int_col].to_numpy(np.int64))]
            )
            out[sum_name] = (ps[hi] - ps[lo]).astype(np.int64)
        return out.reset_index(drop=True)

    return keyed_partition_map(
        ds, keys=[key_col], order_col=order_col, fn=part,
        num_partitions=num_partitions,
    )
