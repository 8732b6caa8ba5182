"""Randomized DuckDB parity for the round-5 catalog additions.

The driver/sweep pins every oracled query on the FIXED testdata; these
tests re-run the same (Ray pipeline, oracle SQL) pairs on RANDOM events
tables — tie-heavy values, sparse users, missing event types, single-row
corners — where the fixed fixtures can't reach the edge semantics
(all-equal closest-pair candidates, empty deciles, one-gap medians,
streak islands of length 1). Same compare as the driver: sort columns,
stringify, sort rows, frame-equal.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from arlas_proc_ray.pipelines.queries import ORACLE_SQL, QUERIES

NAMES = [
    "peak_concurrency",
    "value_bars_ohlc",
    "mad_value",
    "user_max_drawdown",
    "interarrival_stats",
    "activity_streaks",
    "sliding_distinct_users",
    "daily_autocov",
    "range_splitters",
    "weekly_churn",
    "session_type_pairs",
    "closest_spend_pair",
    "user_modal_share",
    "value_decile_conversion",
]

TYPES = ["view", "purchase", "click", "error", "signup"]


def _random_events(rng: np.random.Generator, n: int) -> pd.DataFrame:
    """Adversarial synthetic events: few users (dense per-key groups),
    coarse value grid (heavy ties), day-scale ts spread (streaks/windows
    get runs AND gaps), all five types but possibly missing some."""
    n_users = int(rng.integers(1, 6))
    span_days = int(rng.integers(1, 15))
    ts0 = 1_700_000_000_000_000
    ts = ts0 + rng.integers(0, span_days * 86_400_000_000, size=n)
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(np.sort(ts), unit="us").astype(
                "datetime64[us]"
            ),
            "user_id": rng.integers(0, n_users, size=n).astype(np.int64),
            "event_type": rng.choice(
                TYPES[: int(rng.integers(1, 6))], size=n
            ),
            "value": rng.integers(0, 12, size=n).astype(np.float64) / 4.0,
        }
    )


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def _run_pair(name: str, sf_dir: str) -> None:
    res = QUERIES[name](sf_dir)
    if not isinstance(res, pd.DataFrame):
        res = res.to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM"
        f" read_parquet('{sf_dir}/events.parquet')"
    )
    exp = con.execute(ORACLE_SQL[name]).fetchdf()
    assert len(res) == len(exp), (name, len(res), len(exp))
    assert sorted(res.columns) == sorted(exp.columns), name
    pd.testing.assert_frame_equal(_canon(res), _canon(exp))


@pytest.mark.parametrize("name", NAMES)
@pytest.mark.parametrize("seed", [1, 2, 3])
def test_random_events_parity(name, seed, tmp_path):
    rng = np.random.default_rng(1000 * seed + hash(name) % 1000)
    df = _random_events(rng, n=int(rng.integers(5, 400)))
    df.to_parquet(tmp_path / "events.parquet", index=False)
    _run_pair(name, str(tmp_path))


def test_closest_pair_all_equal(tmp_path):
    """One distinct spend total ⇒ no pair on either engine (the Ray
    side must return the typed empty frame, not crash on min())."""
    df = pd.DataFrame(
        {
            "event_id": np.arange(4, dtype=np.int64),
            "ts": pd.to_datetime([1_700_000_000_000_000] * 4, unit="us").astype("datetime64[us]"),
            "user_id": np.array([0, 1, 2, 3], dtype=np.int64),
            "event_type": ["view"] * 4,
            "value": [2.5] * 4,
        }
    )
    df.to_parquet(tmp_path / "events.parquet", index=False)
    _run_pair("closest_spend_pair", str(tmp_path))


def test_decile_conversion_no_views(tmp_path):
    """No view events ⇒ empty calibration curve on either engine."""
    df = pd.DataFrame(
        {
            "event_id": np.arange(3, dtype=np.int64),
            "ts": pd.to_datetime(
                [1_700_000_000_000_000 + i for i in range(3)], unit="us"
            ).astype("datetime64[us]"),
            "user_id": np.zeros(3, dtype=np.int64),
            "event_type": ["purchase", "error", "click"],
            "value": [1.0, 2.0, 3.0],
        }
    )
    df.to_parquet(tmp_path / "events.parquet", index=False)
    _run_pair("value_decile_conversion", str(tmp_path))


def test_single_event_user(tmp_path):
    """A one-event corpus exercises every 'fewer than two' branch."""
    df = pd.DataFrame(
        {
            "event_id": np.array([7], dtype=np.int64),
            "ts": pd.to_datetime([1_700_000_000_000_000], unit="us").astype("datetime64[us]"),
            "user_id": np.array([3], dtype=np.int64),
            "event_type": ["view"],
            "value": [1.25],
        }
    )
    df.to_parquet(tmp_path / "events.parquet", index=False)
    for name in (
        "activity_streaks",
        "weekly_churn",
        "user_max_drawdown",
        "mad_value",
        "range_splitters",
        "peak_concurrency",
        "value_bars_ohlc",
        "user_modal_share",
        "daily_autocov",
        "sliding_distinct_users",
        "interarrival_stats",
        "session_type_pairs",
        "closest_spend_pair",
        "value_decile_conversion",
    ):
        _run_pair(name, str(tmp_path))
