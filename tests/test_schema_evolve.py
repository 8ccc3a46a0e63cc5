"""Schema-evolution reader: union-by-name fills, default fills, loud
type-conflict failure (sources/evolve.py)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write(tmp_path, name, table):
    p = os.path.join(str(tmp_path), name)
    pq.write_table(table, p)
    return p


@pytest.mark.usefixtures("ray_session")
def test_union_by_name_null_and_default_fill(tmp_path):
    from marc2rdf_ray.sources.evolve import read_parquet_union_by_name

    a = _write(
        tmp_path, "a.parquet",
        pa.table({"id": pa.array([1, 2], pa.int64())}),
    )
    b = _write(
        tmp_path, "b.parquet",
        pa.table(
            {
                "id": pa.array([3], pa.int64()),
                "tag": pa.array(["x"], pa.string()),
                "score": pa.array([2.5], pa.float64()),
            }
        ),
    )
    rows = sorted(
        read_parquet_union_by_name(
            [a, b], defaults={"tag": "old"}
        ).take_all(),
        key=lambda r: r["id"],
    )
    assert rows == [
        {"id": 1, "tag": "old", "score": None},
        {"id": 2, "tag": "old", "score": None},
        {"id": 3, "tag": "x", "score": 2.5},
    ]


def test_union_by_name_type_conflict_raises(tmp_path):
    from marc2rdf_ray.sources.evolve import union_schema

    a = _write(
        tmp_path, "a.parquet",
        pa.table({"id": pa.array([1], pa.int64())}),
    )
    b = _write(
        tmp_path, "b.parquet",
        pa.table({"id": pa.array(["1"], pa.string())}),
    )
    with pytest.raises(TypeError, match="type conflict"):
        union_schema([a, b])


def test_union_schema_over_directory(tmp_path):
    from marc2rdf_ray.sources.evolve import union_schema

    _write(tmp_path, "a.parquet", pa.table({"x": pa.array([1], pa.int64())}))
    _write(
        tmp_path, "b.parquet",
        pa.table(
            {"x": pa.array([2], pa.int64()),
             "y": pa.array(["s"], pa.string())}
        ),
    )
    sch = union_schema([str(tmp_path)])
    assert sch.names == ["x", "y"]
    assert sch.field("y").type == pa.string()
