import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from arlas_proc_ray.sources import (
    read_csv,
    read_parquet,
    write_csv_single,
    write_partitioned_parquet,
)
from arlas_proc_ray.stages.salted import salted_aggregate


def test_parquet_roundtrip_partitioned(tmp_path):
    df = pd.DataFrame({"k": ["a", "a", "b"], "part": [1, 2, 1], "v": [1.0, 2.0, 3.0]})
    out = str(tmp_path / "pq")
    write_partitioned_parquet(rd.from_pandas(df), out, partition_col="part")
    back = read_parquet(out, columns=["k", "v", "part"]).to_pandas()
    assert len(back) == 3
    assert sorted(back["v"]) == [1.0, 2.0, 3.0]


def test_csv_roundtrip(tmp_path):
    p = str(tmp_path / "x.csv")
    pd.DataFrame({"a": [1, 2], "b": ["x", "y"]}).to_csv(p, index=False)
    ds = read_csv(p)
    assert ds.count() == 2
    # write_csv_single stringifies list columns
    df = pd.DataFrame({"a": [1], "tags": [["t1", "t2"]]})
    out = write_csv_single(rd.from_pandas(df), str(tmp_path / "o.csv"))
    assert "[t1,t2]" in open(out).read()


def test_salted_aggregate_hot_key():
    """A single hot key split across salts still aggregates exactly."""
    n = 10_000
    df = pd.DataFrame(
        {
            "k": np.where(np.arange(n) % 10 < 8, "HOT", "cold"),  # 80% one key
            "v": np.arange(n, dtype="int64"),
        }
    )

    def partial(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.groupby("k")
        return g.agg(s=("v", "sum"), n=("v", "count")).reset_index()

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.groupby("k")
        return g.agg(s=("s", "sum"), n=("n", "sum")).reset_index()

    out = (
        salted_aggregate(
            rd.from_pandas(df),
            keys=["k"],
            partial_fn=partial,
            merge_fn=merge,
            salt=4,
            num_partitions=8,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    exp = df.groupby("k").agg(s=("v", "sum"), n=("v", "count")).reset_index()
    pd.testing.assert_frame_equal(out, exp.sort_values("k").reset_index(drop=True))


def test_detect_hot_keys_and_targeted_salting():
    import numpy as np

    from arlas_proc_ray.stages.salted import detect_hot_keys, salted_aggregate

    rng = np.random.RandomState(11)
    # one hot key holding 40% of rows, 200 cold keys sharing the rest
    n = 10_000
    hot_rows = int(n * 0.4)
    keys = ["HOT"] * hot_rows + [f"k{rng.randint(200)}" for _ in range(n - hot_rows)]
    df = pd.DataFrame({"k": keys, "v": rng.randint(0, 100, n)})
    ds = rd.from_pandas(df)

    hot = detect_hot_keys(ds, ["k"], min_fraction=0.05)
    assert hot["k"].tolist() == ["HOT"]
    assert hot["count"].iloc[0] == hot_rows

    # targeted salting: exact distinct-count per key, hot key split 8 ways
    def partial(pdf):
        return (
            pdf.groupby("k", sort=False)["v"]
            .agg(lambda s: list(set(s)))
            .reset_index(name="vals")
        )

    def merge(pdf):
        out = (
            pdf.groupby("k", sort=False)["vals"]
            .agg(lambda lists: len(set().union(*lists)))
            .reset_index(name="n_distinct")
        )
        return out

    got = (
        salted_aggregate(
            rd.from_pandas(df), keys=["k"], partial_fn=partial, merge_fn=merge,
            salt=8, num_partitions=8, hot_keys="auto", hot_fraction=0.05,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    exp = (
        df.groupby("k")["v"].nunique().reset_index(name="n_distinct")
        .sort_values("k").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)
