"""Luby MIS: independence + maximality at the fixpoint."""

import hashlib

import pyarrow as pa
import pytest


@pytest.mark.usefixtures("ray_session")
def test_mis_independent_and_maximal():
    import ray.data as rd

    from marc2rdf_ray.ops.graph import maximal_independent_set

    n = 200
    src, dst = [], []
    for i in range(n):
        for k in range(i % 4):
            t = int(
                hashlib.md5(f"{i}:{k}".encode()).hexdigest()[:8], 16
            ) % n
            src.append(i)
            dst.append(t)
    edges = rd.from_arrow(
        pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
            }
        )
    )
    mis = {
        r["node"] for r in maximal_independent_set(edges).take_all()
    }
    # distributed rounds (forced) must agree bit-for-bit at fixpoint
    edges2 = rd.from_arrow(
        pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
            }
        )
    )
    mis_dist = {
        r["node"]
        for r in maximal_independent_set(
            edges2, local_budget=0
        ).take_all()
    }
    assert mis == mis_dist
    # fixed-round prefixes agree too (the oracle's mode)
    for r_ in (1, 3):
        e3 = rd.from_arrow(
            pa.table(
                {
                    "src": pa.array(src, pa.int64()),
                    "dst": pa.array(dst, pa.int64()),
                }
            )
        )
        e4 = rd.from_arrow(
            pa.table(
                {
                    "src": pa.array(src, pa.int64()),
                    "dst": pa.array(dst, pa.int64()),
                }
            )
        )
        a = {x["node"] for x in maximal_independent_set(
            e3, rounds=r_).take_all()}
        b = {x["node"] for x in maximal_independent_set(
            e4, rounds=r_, local_budget=0).take_all()}
        assert a == b, r_
    adj: dict = {}
    nodes = set()
    for s, d in zip(src, dst):
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
        nodes.add(s)
        nodes.add(d)
    assert mis <= nodes and mis
    # independence: no two MIS nodes adjacent
    for v in mis:
        assert not (adj[v] & mis), v
    # maximality: every non-MIS node has a MIS neighbor
    for v in nodes - mis:
        assert adj[v] & mis, v
