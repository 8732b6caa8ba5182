"""Changelog history views — SCD Type-2 and as-of-LSN time travel.

The warehouse-facing complements of the flagship LWW replay
(cdc/engine.py): instead of collapsing the change stream to its latest
state, keep every version with its validity interval (SCD2), or
reconstruct the state as it stood at an arbitrary LSN (time travel —
finer-grained than the engine's epoch-fenced ``final_state(epoch=)``,
which only travels to epoch boundaries).

Scale shape: both are ONE keyed exchange on the record key; per
partition the version chain per key is a vectorized ``groupby.shift``
(SCD2's ``lead``) or a drop-duplicates-last (as-of), across all keys at
once. Nothing is broadcast and nothing lands on the driver.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from arlas_proc_ray.stages.keyed import keyed_partition_map


def scd2_history(
    changelog_ds,
    *,
    keys: Sequence[str],
    lsn_col: str,
    op_col: str,
    num_partitions: int = 64,
    delete_op: str = "DELETE",
):
    """Slowly-changing-dimension Type-2 table from an I/U/D changelog.

    One output row per non-delete event: the version it wrote, valid
    from its own LSN until the next event (any op, including the delete
    that retracts it) touches the same key — ``valid_to`` null while
    still current. ``is_current`` marks open intervals.
    """
    keys = list(keys)

    def part(pdf: pd.DataFrame) -> pd.DataFrame:
        # sorted by (keys..., lsn) on entry; lead(lsn) over the key
        pdf = pdf.copy()
        pdf["valid_to"] = pdf.groupby(keys, sort=False)[lsn_col].shift(-1)
        pdf = pdf[pdf[op_col] != delete_op].drop(columns=[op_col])
        pdf["is_current"] = pdf["valid_to"].isna()
        pdf["valid_to"] = pdf["valid_to"].astype("Int64")
        return pdf.rename(columns={lsn_col: "valid_from"})

    return keyed_partition_map(
        changelog_ds,
        keys=keys,
        order_col=lsn_col,
        fn=part,
        num_partitions=num_partitions,
    )


def temporal_join(
    facts_ds,
    versions_ds,
    *,
    keys: Sequence[str],
    lsn_col: str,
    version_value_cols: Sequence[str],
    suffix: str = "_v",
    num_partitions: int = 64,
):
    """Inner temporal join: each fact row paired with the SCD2 version
    of its key that was valid AT the fact's LSN (``valid_from <= lsn``
    and ``valid_to`` open or ``> lsn``).

    The warehouse pattern "join facts to the dimension as it was at
    transaction time", composed from the existing primitives: a keyed
    as-of join against version starts (one co-partition exchange,
    ``stages/joins.py:40``) plus a vectorized liveness filter — no new
    shuffle machinery. Facts whose key had no live version at their LSN
    (e.g. inside a delete/rebirth gap) are dropped.
    """
    from arlas_proc_ray.stages.joins import asof_join

    keys = list(keys)
    value_cols = list(version_value_cols)

    def ren(t: pa.Table) -> pa.Table:
        # keep valid_from visible under a stable alias (the as-of `on`
        # column itself is not echoed), then align names for the join
        t = t.append_column("version_from", t.column("valid_from"))
        names = [lsn_col if c == "valid_from" else c for c in t.column_names]
        return t.rename_columns(names)

    vds = versions_ds.map_batches(ren, batch_format="pyarrow", batch_size=None)
    joined = asof_join(
        facts_ds,
        vds,
        by=keys,
        on=lsn_col,
        right_cols=value_cols + ["version_from", "valid_to"],
        suffix=suffix,
        allow_exact_matches=True,
        num_partitions=num_partitions,
    )
    vfrom, vto = "version_from" + suffix, "valid_to" + suffix

    def live(t: pa.Table) -> pa.Table:
        lsn = t.column(lsn_col)
        matched = pc.is_valid(t.column(vfrom))
        open_or_after = pc.or_kleene(
            pc.is_null(t.column(vto)), pc.greater(t.column(vto), lsn)
        )
        keep = pc.and_(matched, pc.fill_null(open_or_after, False))
        t = t.filter(keep)
        return t.drop_columns([vto])

    return joined.map_batches(live, batch_format="pyarrow", batch_size=None)


def as_of_state(
    changelog_ds,
    *,
    keys: Sequence[str],
    lsn_col: str,
    op_col: str,
    as_of_lsn: int,
    num_partitions: int = 64,
    delete_op: str = "DELETE",
):
    """Table state as it stood at ``as_of_lsn`` (inclusive): the last
    event per key with ``lsn <= as_of_lsn``, dropped if that event was a
    delete. The LSN filter pushes into the scan side of the exchange, so
    travelling far back ships only the surviving prefix."""
    keys = list(keys)
    pruned = changelog_ds.filter(expr=f"{lsn_col} <= {int(as_of_lsn)}")

    def part(pdf: pd.DataFrame) -> pd.DataFrame:
        last = pdf.drop_duplicates(subset=keys, keep="last")
        return last[last[op_col] != delete_op].drop(columns=[op_col])

    return keyed_partition_map(
        pruned,
        keys=keys,
        order_col=lsn_col,
        fn=part,
        num_partitions=num_partitions,
    )
