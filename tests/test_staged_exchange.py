"""Staged-vs-sort exchange parity for keyed_partition_map.

The catalog defaults keyed ops to the two-phase staged exchange
(pipelines/queries.py wrapper — sub-crossover volumes); these tests pin
that the staged path is byte-identical to the sort path, including the
one semantic difference the docstring names: staged materializes 0-row
partitions and hands them to the partition fn (the sort path never
does). The run_collapse_fn regression here reproduced as a KeyError in
the tempo_proportion_collapse sweep before the fix in
stages/summarize.py (empty input must emit the rest∪agg column set).

Partition fns are built INSIDE the tests (closures) so Ray pickles them
by value — a module-level fn would pickle as a reference to this test
module, which worker processes cannot import.
"""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from arlas_proc_ray.stages.keyed import keyed_partition_map


def _fixture(n=500, keys=7, seed=3):
    rng = np.random.default_rng(seed)
    key_pool = [f"k{i}" for i in range(keys - 1)] + ["nul\x00key"]
    return pd.DataFrame(
        {
            "k": rng.choice(key_pool, size=n),
            "o": rng.permutation(n).astype("int64"),
            "v": rng.integers(-1000, 1000, size=n).astype("int64"),
        }
    )


def _run(pdf, fn, num_partitions, exchange):
    out = keyed_partition_map(
        rd.from_pandas(pdf, override_num_blocks=4),
        keys=["k"],
        order_col="o",
        fn=fn,
        num_partitions=num_partitions,
        exchange=exchange,
    ).to_pandas()
    return out.sort_values(list(out.columns), kind="mergesort").reset_index(
        drop=True
    )


def _make_fn(kind: str):
    if kind == "agg":

        def fn(pdf: pd.DataFrame) -> pd.DataFrame:
            g = pdf.groupby("k", sort=False)["v"]
            out = g.agg(total="sum", n="count").reset_index()
            out["n"] = out["n"].astype("int64")
            return out

    else:

        def fn(pdf: pd.DataFrame) -> pd.DataFrame:
            # event-sized output: per-row delta within the sorted key run
            prev = pdf.groupby("k", sort=False)["v"].shift(1).fillna(0)
            return pd.DataFrame(
                {
                    "k": pdf["k"],
                    "o": pdf["o"].to_numpy(np.int64),
                    "delta": (pdf["v"] - prev).to_numpy(np.int64),
                }
            )

    return fn


@pytest.mark.parametrize("kind", ["agg", "rowwise"])
def test_staged_matches_sort(kind):
    pdf = _fixture()
    fn = _make_fn(kind)
    a = _run(pdf, fn, num_partitions=8, exchange="sort")
    b = _run(pdf, fn, num_partitions=8, exchange="staged")
    pd.testing.assert_frame_equal(a, b)


@pytest.mark.parametrize("kind", ["agg", "rowwise"])
def test_staged_empty_partitions_match_sort(kind):
    # P ≫ distinct keys: most staged partitions are 0-row; the result
    # must still equal the sort path (which never sees empty groups)
    pdf = _fixture(n=60, keys=3)
    fn = _make_fn(kind)
    a = _run(pdf, fn, num_partitions=64, exchange="sort")
    b = _run(pdf, fn, num_partitions=64, exchange="staged")
    pd.testing.assert_frame_equal(a, b)


def test_collapse_empty_partition_schema_regression():
    # run_collapse_fn(passthrough=False) on a 0-row partition must emit
    # the aggregated column set, not the input schema — the staged
    # default made this reachable (tempo_proportion_collapse KeyError)
    from arlas_proc_ray.stages.summarize import run_collapse_fn

    pdf = _fixture(n=40, keys=2)
    pdf["w"] = np.abs(pdf["v"]) + 1

    collapse = run_collapse_fn(
        keys=["k"],
        order_col="o",
        group_col="k",
        condition=lambda p: pd.Series(True, index=p.index),
        agg={
            "v_w": ("v", "wmean", "w"),
            "n_events": ("o", "count"),
            "w_total": ("w", "sum"),
        },
        passthrough=False,
    )

    def finish(p: pd.DataFrame) -> pd.DataFrame:
        # touches the agg columns — KeyErrors if an empty partition
        # leaked the input schema
        p = collapse(p)
        p["n_events"] = p["n_events"].astype("int64")
        return p

    a = _run(pdf, finish, num_partitions=32, exchange="sort")
    b = _run(pdf, finish, num_partitions=32, exchange="staged")
    pd.testing.assert_frame_equal(a, b)
    assert {"v_w", "n_events", "w_total"} <= set(b.columns)


def test_chain_fused_staged_matches_sort():
    # fused keyed chains must be exchange-agnostic too
    pdf = _fixture(n=300, keys=5)

    def lag_fn(p):
        p = p.copy()
        p["v_lag"] = p.groupby("k", sort=False)["v"].shift(1).fillna(0).astype("int64")
        return p

    def cum_fn(p):
        p = p.copy()
        p["v_cum"] = p.groupby("k", sort=False)["v"].cumsum().astype("int64")
        return p

    def run(exchange):
        out = keyed_partition_map(
            rd.from_pandas(pdf, override_num_blocks=3),
            keys=["k"],
            order_col="o",
            chain=[lag_fn, cum_fn],
            num_partitions=16,
            exchange=exchange,
        ).to_pandas()
        return out.sort_values(["k", "o"], kind="mergesort").reset_index(drop=True)

    pd.testing.assert_frame_equal(run("sort"), run("staged"))


from hypothesis import given, settings
from hypothesis import strategies as st

_rows = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "", "\x00", "a\x00b", "long-key-ü"]),
        st.integers(0, 10_000),
        st.integers(-(2**40), 2**40),
        st.sampled_from(["", "x", "\x00y", None]),
    ),
    min_size=0,
    max_size=60,
)


@settings(max_examples=8, deadline=None)
@given(_rows)
def test_staged_parity_property(rows):
    # random frames: byte-exact string keys (NULs, empties, unicode),
    # nullable object payloads, duplicate (k, o) pairs — staged must
    # agree with sort after a stable per-key aggregation
    pdf = pd.DataFrame(rows, columns=["k", "o", "v", "s"])
    pdf["o"] = pdf["o"].astype("int64")
    pdf["v"] = pdf["v"].astype("int64")

    def fn(p: pd.DataFrame) -> pd.DataFrame:
        g = p.groupby("k", sort=False)
        out = pd.DataFrame(
            {
                "total": g["v"].sum(),
                "n": g["v"].count().astype("int64"),
                "first_s": g["s"].first(),
            }
        ).reset_index()
        return out

    if len(pdf) == 0:
        # all-empty input: the staged path falls back to sort — covered
        # by the typed-empty fallback unit in the keyed suites
        return
    a = _run(pdf, fn, num_partitions=16, exchange="sort")
    b = _run(pdf, fn, num_partitions=16, exchange="staged")
    pd.testing.assert_frame_equal(a, b)
