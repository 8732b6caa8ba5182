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


def test_three_version_chain_with_type_widening():
    """v1 -> v2 (rename) -> v3 (int32 -> int64 widening + new column):
    mixed-version batches align to the latest schema; renames compose
    across versions; narrower ints cast losslessly."""
    import pyarrow as pa

    from arlas_proc_ray.schema import SchemaRegistry

    v1 = pa.schema(
        [("id", pa.string()), ("size", pa.int32()), ("schema_version", pa.int32())]
    )
    v2 = pa.schema(
        [("key", pa.string()), ("size", pa.int32()), ("schema_version", pa.int32())]
    )
    v3 = pa.schema(
        [
            ("key", pa.string()),
            ("size", pa.int64()),          # widened
            ("note", pa.string()),          # new in v3
            ("schema_version", pa.int32()),
        ]
    )
    reg = SchemaRegistry()
    reg.register(1, v1, renames_to_next={"id": "key"})
    reg.register(2, v2)
    reg.register(3, v3)

    b1 = pa.table({"id": ["a"], "size": pa.array([7], pa.int32()),
                   "schema_version": pa.array([1], pa.int32())})
    b2 = pa.table({"key": ["b"], "size": pa.array([2**31 - 1], pa.int32()),
                   "schema_version": pa.array([2], pa.int32())})

    a1 = reg.align_table(b1, from_version=1)
    a2 = reg.align_table(b2, from_version=2)
    assert a1.schema.equals(a2.schema)
    assert a1.column("key").to_pylist() == ["a"]
    assert a1.schema.field("size").type == pa.int64()
    assert a2.column("size").to_pylist() == [2**31 - 1]
    assert a1.column("note").to_pylist() == [None]
