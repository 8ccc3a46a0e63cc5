"""Local replica of the driver's correctness gate.

Runs every __ray_entry__.queries() entry at the given sf dir, runs the
matching oracle_sql() through DuckDB over the same parquet views, and
compares row count, column names/types, and an order-insensitive value hash
(columns sorted by name, rows sorted by their string repr).

Usage:  python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    rows = sorted(
        df.astype(str).apply(lambda r: "\x1f".join(r.values), axis=1).tolist()
    )
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False,
            logging_level="ERROR",
        )
    import logging

    logging.getLogger("ray.data").setLevel(logging.CRITICAL)

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"FAIL  {name}: query raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        wall = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(got)} rows ({wall:.1f}s, no oracle)")
            continue
        try:
            want = con.sql(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL  {name}: oracle raised {ex}")
            failures += 1
            continue
        ok_rows = len(got) == len(want)
        ok_cols = sorted(got.columns) == sorted(want.columns)
        ok_hash = ok_rows and ok_cols and value_hash(got) == value_hash(want)
        status = "ok   " if (ok_rows and ok_cols and ok_hash) else "FAIL "
        if status.startswith("FAIL"):
            failures += 1
        print(
            f"{status} {name}: rows {len(got)}/{len(want)} cols_ok={ok_cols} "
            f"hash_ok={ok_hash} ({wall:.1f}s)"
        )
        if not ok_cols:
            print(f"      got  cols: {sorted(got.columns)}")
            print(f"      want cols: {sorted(want.columns)}")
        elif not ok_hash and ok_rows:
            merged = got[sorted(got.columns)].astype(str)
            wanted = want[sorted(want.columns)].astype(str)
            gs = set(map(tuple, merged.values.tolist()))
            ws = set(map(tuple, wanted.values.tolist()))
            diff_g = list(gs - ws)[:3]
            diff_w = list(ws - gs)[:3]
            print(f"      only-in-got:  {diff_g}")
            print(f"      only-in-want: {diff_w}")
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
