"""kg_flagship_edges DuckDB oracle == the real pipeline output, hash-exact
(VERDICT r4 next-round #1: the flagship's EDGE output was the only
rows-only driver row; this locks the SQL replay against the Ray run)."""

import pytest


@pytest.mark.usefixtures("ray_session")
def test_flagship_edges_oracle_matches_pipeline():
    import duckdb

    from marc2rdf_ray.entry_queries import (
        flagship_edges_oracle_sql,
        kg_flagship_edges,
    )

    got = kg_flagship_edges("/root/testdata/sf0.001")  # sf_dir unused
    con = duckdb.connect()
    exp = con.execute(flagship_edges_oracle_sql()).fetch_arrow_table()
    assert got.num_rows == exp.num_rows > 10000

    def keyset(tab):
        return {
            tuple(tab.column(c)[i].as_py() for c in tab.column_names)
            for i in range(tab.num_rows)
        }

    assert keyset(got) == keyset(exp)


def test_fixture_is_deterministic_and_idempotent():
    import os

    import pyarrow.parquet as pq

    from marc2rdf_ray.entry_queries import flagship_pages_fixture

    p1 = flagship_pages_fixture()
    mtime = os.path.getmtime(p1)
    p2 = flagship_pages_fixture()  # second call must not rewrite
    assert p1 == p2 and os.path.getmtime(p2) == mtime
    t = pq.read_table(p1)
    assert t.num_rows == 200
    assert set(t.column_names) >= {"url", "warc_ts", "html", "text", "lang"}
