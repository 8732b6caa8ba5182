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
