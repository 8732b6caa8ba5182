import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from arlas_proc_ray.transform import (
    BatchTransform,
    KeyedTransform,
    Pipeline,
    SchemaContractError,
)


def _make_double_v():
    # defined via factory so cloudpickle serializes the fn BY VALUE
    # (a module-level test function pickles by reference to a module the
    # Ray workers cannot import)
    def double_v(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.append_column("v2", pc.multiply(t.column("v"), 2))

    return double_v


def test_pipeline_runs_chain():
    ds = rd.from_pandas(pd.DataFrame({"id": ["a", "a", "b"], "seq": [1, 2, 1],
                                      "v": [1.0, 2.0, 3.0]}))
    t1 = BatchTransform(
        _make_double_v(), required_cols=["v"], added_fields=[pa.field("v2", pa.float64())]
    )

    def lag_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf["prev_v2"] = pdf.groupby("id", sort=False)["v2"].shift(1)
        return pdf

    t2 = KeyedTransform(
        lag_fn,
        keys=["id"],
        order_col="seq",
        required_cols=["id", "seq", "v2"],
        added_fields=[pa.field("prev_v2", pa.float64())],
        num_partitions=2,
    )
    out = Pipeline(t1, t2).run(ds).to_pandas().sort_values(["id", "seq"])
    assert out["v2"].tolist() == [2.0, 4.0, 6.0]
    assert pd.isna(out["prev_v2"].iloc[0]) and out["prev_v2"].iloc[1] == 2.0


def test_pipeline_validates_whole_chain_eagerly():
    """A missing column ANYWHERE in the chain fails before any execution —
    the reference only discovers it when Spark fit() reaches the stage."""
    ds = rd.from_pandas(pd.DataFrame({"id": ["a"], "v": [1.0]}))
    t1 = BatchTransform(_make_double_v(), required_cols=["v"],
                        added_fields=[pa.field("v2", pa.float64())])
    t_bad = BatchTransform(lambda t: t, required_cols=["nonexistent"])
    with pytest.raises(SchemaContractError, match="nonexistent"):
        Pipeline(t1, t_bad).run(ds)


def test_dropped_cols_tracked():
    ds = rd.from_pandas(pd.DataFrame({"a": [1], "b": [2]}))
    t_drop = BatchTransform(
        lambda t: t.drop_columns(["b"]), required_cols=["b"], dropped_cols=["b"]
    )
    t_needs_b = BatchTransform(lambda t: t, required_cols=["b"])
    with pytest.raises(SchemaContractError):
        Pipeline(t_drop, t_needs_b).run(ds)
    # and without the later stage it runs fine
    out = Pipeline(t_drop).run(ds).to_pandas()
    assert list(out.columns) == ["a"]
