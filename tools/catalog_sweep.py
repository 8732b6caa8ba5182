"""Driver-strict sweep of the whole query catalog vs the DuckDB oracles.

Replicates the correctness driver's compare locally: run every
``queries()`` entry that has an ``oracle_sql()`` twin, sort columns by
name, stringify every cell, sort rows, and require frame equality —
at sf0.001 and sf0.01 (the scales the driver checks). Rows-only queries
are executed for a row count only (their independent Python oracles
live in tests/test_python_oracles.py and the unit suites).

Usage:
    python tools/catalog_sweep.py                  # both scales, all queries
    python tools/catalog_sweep.py sf0.01 name ...  # one scale / name filter

Owns its Ray session (run it alone — never concurrently with bench.py).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def sweep(sf_dirs, only=None) -> int:
    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=16, include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry

    qs, osql = entry.queries(), entry.oracle_sql()
    names = sorted(only or qs)
    failures = []
    for sf_dir in sf_dirs:
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM"
                f" read_parquet('{sf_dir}/{t}.parquet')"
            )
        for name in names:
            t0 = time.perf_counter()
            try:
                r = qs[name](sf_dir)
                if isinstance(r, rd.Dataset):
                    r = r.to_pandas()
                elif hasattr(r, "to_pandas") and not isinstance(r, pd.DataFrame):
                    r = r.to_pandas()
                if name not in osql:
                    print(f"  {sf_dir.split('/')[-1]} {name}: rows-only "
                          f"({len(r)} rows, {time.perf_counter() - t0:.2f}s)")
                    continue
                o = con.execute(osql[name]).df()
                cols = sorted(r.columns)
                assert cols == sorted(o.columns), (
                    f"columns {cols} != {sorted(o.columns)}"
                )
                r2 = (
                    r[cols].astype(str).sort_values(cols).reset_index(drop=True)
                )
                o2 = (
                    o[cols].astype(str).sort_values(cols).reset_index(drop=True)
                )
                pd.testing.assert_frame_equal(r2, o2)
                print(f"  {sf_dir.split('/')[-1]} {name}: oracle-exact "
                      f"({len(r2)} rows, {time.perf_counter() - t0:.2f}s)")
            except Exception as e:  # keep sweeping, report at the end
                failures.append((sf_dir, name, repr(e)[:200]))
                print(f"  {sf_dir.split('/')[-1]} {name}: FAIL {e!r}"[:160])
    print(f"\n{len(failures)} failures")
    for sf_dir, name, err in failures:
        print(f"  FAIL {sf_dir} {name}: {err}")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    args = sys.argv[1:]
    scales = [a for a in args if a.startswith("sf")]
    names = [a for a in args if not a.startswith("sf")]
    sf_dirs = [
        f"/root/testdata/{s}" for s in (scales or ["sf0.001", "sf0.01"])
    ]
    sys.exit(sweep(sf_dirs, only=names or None))
