import pyarrow as pa
import pytest

from arlas_proc_ray.schema import SchemaEvolutionError, SchemaRegistry


def _reg():
    reg = SchemaRegistry()
    reg.register(
        1,
        pa.schema([("id", pa.int64()), ("lang", pa.string())]),
        renames_to_next={"lang": "language"},
    )
    reg.register(
        2,
        pa.schema(
            [("id", pa.int64()), ("language", pa.string()), ("size", pa.int64())]
        ),
    )
    return reg


def test_latest_and_rename_map():
    reg = _reg()
    assert reg.latest_version == 2
    assert reg.rename_map(1) == {"lang": "language"}
    assert reg.rename_map(2) == {}


def test_align_v1_table():
    reg = _reg()
    t = pa.table({"id": pa.array([1, 2], pa.int32()), "lang": ["py", "rs"]})
    out = reg.align_table(t, from_version=1)
    assert out.schema == reg.latest_schema
    assert out.column("language").to_pylist() == ["py", "rs"]
    assert out.column("size").null_count == 2
    assert out.column("id").type == pa.int64()  # cast applied


def test_align_drops_unknown_columns():
    reg = _reg()
    t = pa.table({"id": [1], "language": ["py"], "size": [9], "junk": ["x"]})
    out = reg.align_table(t, from_version=2)
    assert "junk" not in out.column_names


def test_empty_registry_raises():
    with pytest.raises(SchemaEvolutionError):
        SchemaRegistry().latest_version


def test_multi_hop_rename_composition():
    reg = SchemaRegistry()
    reg.register(1, pa.schema([("a", pa.int64())]), renames_to_next={"a": "b"})
    reg.register(2, pa.schema([("b", pa.int64())]), renames_to_next={"b": "c"})
    reg.register(3, pa.schema([("c", pa.int64())]))
    assert reg.rename_map(1) == {"a": "c", "b": "c"}
    t = pa.table({"a": [1, 2]})
    assert reg.align_table(t, from_version=1).column_names == ["c"]
