"""Measure the sort-vs-staged keyed-exchange crossover empirically.

The library default for keyed_partition_map is the streaming sort
shuffle; the query catalog opts into the two-phase staged raw-task
exchange (pipelines/queries.py rationale). This tool plots the actual
crossover on this machine: one keyed aggregation over N rows × both
exchanges, N swept log-scale, best-of-R each.

Usage:
    python tools/exchange_crossover.py [rows ...]             # scalar rows
    python tools/exchange_crossover.py --payload 1024 [rows ...]
        # adds a payload-BYTES string column carried THROUGH the
        # exchange with an event-sized output — the shape where the
        # staged path's blocks×P object fan-out actually costs (the
        # CDC engine's measured ~1M-row crossover was this shape, with
        # multi-KB content strings)

Owns its Ray session (run it alone — never concurrently with bench.py).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd


def main(row_counts: list[int], payload: int = 0) -> None:
    import ray
    import ray.data as rd

    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from arlas_proc_ray.stages.keyed import keyed_partition_map

    def agg(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.groupby("k", sort=False)["v"]
        out = g.agg(total="sum", n="count").reset_index()
        out["n"] = out["n"].astype("int64")
        return out

    def rowwise(pdf: pd.DataFrame) -> pd.DataFrame:
        # event-sized output carrying the payload through the exchange
        prev = pdf.groupby("k", sort=False)["v"].shift(1).fillna(0)
        pdf = pdf.copy()
        pdf["delta"] = (pdf["v"] - prev).to_numpy(np.int64)
        return pdf

    fn = rowwise if payload else agg

    print(f"{'rows':>12} {'sort_s':>8} {'staged_s':>9}  winner")
    for n in row_counts:
        rng = np.random.default_rng(7)
        pdf = pd.DataFrame(
            {
                "k": rng.integers(0, max(16, n // 20), size=n).astype("int64"),
                "o": np.arange(n, dtype="int64"),
                "v": rng.integers(-1000, 1000, size=n).astype("int64"),
            }
        )
        if payload:
            alphabet = np.frombuffer(b"abcdefghijklmnop", dtype="S1")
            body = rng.choice(alphabet, size=payload).tobytes().decode()
            pdf["content"] = pd.array(
                [body] * n, dtype="object"
            )  # constant body: measures exchange bytes, not generation
        blocks = max(4, min(64, n // 50_000 or 4))
        base = rd.from_pandas(pdf, override_num_blocks=blocks).materialize()
        best = {}
        for mode in ("sort", "staged"):
            t_best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                keyed_partition_map(
                    base, keys=["k"], order_col="o", fn=fn,
                    num_partitions=64, exchange=mode,
                ).count()
                t_best = min(t_best, time.perf_counter() - t0)
            best[mode] = t_best
        winner = "staged" if best["staged"] < best["sort"] else "sort"
        print(
            f"{n:>12,} {best['sort']:>8.3f} {best['staged']:>9.3f}  {winner}"
        )

    ray.shutdown()


if __name__ == "__main__":
    args = sys.argv[1:]
    payload = 0
    if args and args[0] == "--payload":
        payload = int(args[1])
        args = args[2:]
    counts = [int(a.replace("_", "")) for a in args] or [
        10_000, 100_000, 500_000, 1_000_000, 2_000_000, 5_000_000, 10_000_000,
        20_000_000,
    ]
    main(counts, payload=payload)
