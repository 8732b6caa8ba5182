"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry at sf0.001 and compares against
``oracle_sql()`` executed by DuckDB on the same parquet: row count, column
names, and order-insensitive value equality (sorted by all columns).
"""

import math

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def _to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype(bool)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


SQL_QUERIES = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", SQL_QUERIES)
def test_query_matches_oracle(name, con):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]

    got = _canon(_to_pandas(q(SF_DIR)))
    exp = _canon(con.sql(sql).df())

    assert list(got.columns) == list(exp.columns), (
        f"{name}: columns {list(got.columns)} != {list(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name}: rows {len(got)} != {len(exp)}"
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, atol=0, rtol=0)
    # the driver hashes VALUES: an int64 123 and a float64 123.0 are equal
    # to assert_frame_equal but not necessarily to a value hash — require
    # the string forms to match too (catches int-vs-float dtype drift,
    # e.g. DuckDB HUGEINT sums landing as float64)
    mism = [
        c for c in got.columns
        if not got[c].astype(str).equals(exp[c].astype(str))
    ]
    assert not mism, f"{name}: string-form mismatch in columns {mism}"


def test_rows_only_queries_run():
    qs = entry_mod.queries()
    rows_only = set(qs) - set(entry_mod.oracle_sql())
    assert rows_only, "expected some non-SQL queries"
    for name in sorted(rows_only):
        df = _to_pandas(qs[name](SF_DIR))
        assert df is not None and len(df) >= 0, name
