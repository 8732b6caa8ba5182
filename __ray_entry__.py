"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship CDC replay pipeline; ``queries()`` exposes
every implemented operator/pipeline from SURVEY.md §2 (plus the
training-data operator family); ``oracle_sql()`` gives the DuckDB-runnable
ANSI-SQL equivalent for each SQL-expressible query (same column names —
the driver hash-compares values after sorting columns by name).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (nor in the library) calls ``ray.init`` / ``ray.shutdown``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    from arlas_proc_ray.pipelines.flagship import entry_pipeline

    return entry_pipeline()


def queries() -> dict[str, Callable[[str], Any]]:
    from arlas_proc_ray.pipelines.flagship import cdc_replay_final_state
    from arlas_proc_ray.pipelines.queries import QUERIES

    out = dict(QUERIES)
    # flagship replay over the synthesized changelog; SQL-oracled — the
    # counter-based generator is regenerated inside DuckDB (splitmix64 in
    # HUGEINT arithmetic) and reduced to the same final LWW state
    out["cdc_replay_final_state"] = cdc_replay_final_state
    return out


def oracle_sql() -> dict[str, str]:
    from arlas_proc_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
