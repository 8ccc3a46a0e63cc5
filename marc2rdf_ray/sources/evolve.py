"""Schema-evolution Parquet reading: union heterogeneous file schemas
by column NAME, filling columns a file predates with typed nulls (or
caller defaults) -- the "old shards lack the new column" situation every
long-lived 100-TB lake hits (reference analog: marcfix's forgiving
handling of records written before a field existed, marcfix.rb).

Design: schemas come from parquet FOOTERS only (pyarrow.parquet
metadata, O(#files) driver work, no data read); each input then streams
through its own pruned ``ray.data.read_parquet`` and ONE stateless
map_batches aligns it to the union schema -- no shuffle, no
materialization, blocks stay Arrow end-to-end.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.fs as pafs


def union_schema(paths, filesystem=None) -> pa.Schema:
    """Union-by-name schema over the given parquet files/dirs (footers
    only).  First occurrence of a name fixes its type; a later file
    whose same-named column disagrees on type raises loudly (silent
    casts corrupt lakes)."""
    import pyarrow.parquet as pq

    from ..state.fsio import resolve_fs

    fields: dict[str, pa.Field] = {}
    order: list[str] = []
    for p in paths:
        fs, rel = (
            resolve_fs(p) if filesystem is None else (filesystem, p)
        )
        info = fs.get_file_info(rel)
        if getattr(info, "is_file", False) or str(
            getattr(info, "type", "")
        ).endswith("File"):
            files = [rel]
        else:
            files = sorted(
                f.path
                for f in fs.get_file_info(
                    pafs.FileSelector(rel, recursive=True)
                )
                if f.path.endswith(".parquet")
            )
        for f in files:
            sch = pq.read_schema(f, filesystem=fs)
            for field in sch:
                prev = fields.get(field.name)
                if prev is None:
                    fields[field.name] = field
                    order.append(field.name)
                elif prev.type != field.type:
                    raise TypeError(
                        f"schema evolution type conflict on "
                        f"'{field.name}': {prev.type} vs {field.type} "
                        f"in {f}"
                    )
    return pa.schema([fields[n] for n in order])


def read_parquet_union_by_name(paths, *, defaults: dict | None = None,
                               columns: list[str] | None = None):
    """Read several parquet paths whose schemas differ by ADDED/missing
    columns as ONE Dataset with the union-by-name schema.  Missing
    columns fill with ``defaults[name]`` (a Python scalar) or typed
    nulls.  ``columns`` prunes the union schema (and each file's read)
    to the named subset."""
    import pyarrow.compute as pc  # noqa: F401
    import ray.data as rd

    defaults = defaults or {}
    target = union_schema(paths)
    if columns is not None:
        target = pa.schema([target.field(c) for c in columns])
    names = [f.name for f in target]

    def align(schema_names):
        have = set(schema_names)

        def fn(b: pa.Table) -> pa.Table:
            cols = []
            for f in target:
                if f.name in have:
                    cols.append(b[f.name].cast(f.type))
                elif f.name in defaults:
                    cols.append(
                        pa.array([defaults[f.name]] * len(b), f.type)
                    )
                else:
                    cols.append(pa.nulls(len(b), f.type))
            return pa.table(dict(zip(names, cols)))

        return fn

    out = None
    for p in paths:
        sch = union_schema([p])
        keep = [n for n in names if n in set(f.name for f in sch)]
        ds = rd.read_parquet(p, columns=keep or None).map_batches(
            align([f.name for f in sch]), batch_format="pyarrow"
        )
        out = ds if out is None else out.union(ds)
    return out
