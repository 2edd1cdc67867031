"""Schema-evolution reader: DuckDB union_by_name parity, numeric
widening, missing→null, pruned read, irreconcilable-type guard."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cerberus_ray.sources.union_by_name import (read_union_by_name,
                                                unified_schema)


@pytest.fixture
def lake(tmp_path):
    """Three schema generations of one logical table."""
    d = tmp_path / "lake"
    d.mkdir()
    pq.write_table(pa.table({
        "id": pa.array([1, 2], pa.int32()),
        "v": pa.array([1.5, 2.5], pa.float32())}), d / "gen1.parquet")
    pq.write_table(pa.table({
        "id": pa.array([3, 4], pa.int64()),
        "v": pa.array([3.5, 4.5], pa.float64()),
        "tag": pa.array(["x", "y"], pa.string())}), d / "gen2.parquet")
    pq.write_table(pa.table({
        "tag": pa.array(["z"], pa.string()),
        "id": pa.array([5], pa.int64())}), d / "gen3.parquet")
    return str(d)


def test_unified_schema(lake):
    sch = unified_schema(lake)
    assert sch.names == ["id", "v", "tag"]
    assert sch.field("id").type == pa.int64()
    assert sch.field("v").type == pa.float64()
    assert sch.field("tag").type == pa.string()


def test_duckdb_union_by_name_parity(ray_session, lake):
    got = (read_union_by_name(lake).to_pandas()
           .sort_values("id").reset_index(drop=True))
    want = duckdb.sql(
        f"SELECT id, v, tag FROM read_parquet('{lake}/*.parquet', "
        f"union_by_name=true) ORDER BY id").fetchdf()
    assert got["id"].tolist() == want["id"].tolist()
    assert got["tag"].fillna("∅").tolist() == want["tag"].fillna(
        "∅").tolist()
    np.testing.assert_allclose(got["v"].to_numpy(), want["v"].to_numpy(),
                               equal_nan=True)


def test_column_pruning(ray_session, lake):
    ds = read_union_by_name(lake, columns=["id", "tag"])
    assert ds.schema().names == ["id", "tag"]
    got = ds.to_pandas()
    assert len(got) == 5


def test_irreconcilable_types_raise(tmp_path):
    d = tmp_path / "bad"
    d.mkdir()
    pq.write_table(pa.table({"x": pa.array([1], pa.int64())}),
                   d / "a.parquet")
    pq.write_table(pa.table({"x": pa.array(["s"], pa.string())}),
                   d / "b.parquet")
    with pytest.raises(TypeError):
        unified_schema(str(d))


def test_int_float_widening(tmp_path):
    d = tmp_path / "w"
    d.mkdir()
    pq.write_table(pa.table({"x": pa.array([1], pa.int64())}),
                   d / "a.parquet")
    pq.write_table(pa.table({"x": pa.array([1.5], pa.float32())}),
                   d / "b.parquet")
    assert unified_schema(str(d)).field("x").type == pa.float64()


def test_empty_dir_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        unified_schema(str(tmp_path))


def test_schema_diff(tmp_path):
    from cerberus_ray.sources.union_by_name import schema_diff

    a, b = tmp_path / "a", tmp_path / "b"
    a.mkdir(); b.mkdir()
    pq.write_table(pa.table({
        "id": pa.array([1], pa.int32()),
        "gone": pa.array(["x"], pa.string()),
        "v": pa.array([1.0], pa.float64())}), a / "f.parquet")
    pq.write_table(pa.table({
        "id": pa.array([1], pa.int64()),
        "v": pa.array([1.0], pa.float64()),
        "fresh": pa.array([True], pa.bool_())}), b / "f.parquet")
    d = schema_diff(str(a), str(b)).set_index("column")["status"]
    assert d.to_dict() == {"fresh": "added", "gone": "removed",
                           "id": "changed", "v": "unchanged"}
