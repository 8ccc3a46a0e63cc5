"""Boruvka MSF: fixpoint equals an independent union-find Kruskal.

With a strict total order on edges -- here the lexicographic (w, u, v)
key with md5-derived 48-bit weights -- the minimum spanning forest is
unique, so Boruvka (per-component argmin + contraction rounds) and
Kruskal (global sort + union-find) must produce the identical edge set.
The two implementations share NO code: the test's Kruskal is a plain
Python union-find over a driver-side edge list.
"""

import hashlib

import numpy as np
import pyarrow as pa
import pytest


def _md5_edges(n_nodes: int, fanout_mod: int = 4):
    """The entry_queries md5 link graph, driver-side."""
    src, dst = [], []
    for i in range(n_nodes):
        for k in range(i % fanout_mod):
            t = int(
                hashlib.md5(f"{i}:{k}".encode()).hexdigest()[:8], 16
            ) % n_nodes
            src.append(i)
            dst.append(t)
    return src, dst


def _canon_weighted(src, dst):
    seen = {}
    for s, d in zip(src, dst):
        if s == d:
            continue
        u, v = min(s, d), max(s, d)
        if (u, v) not in seen:
            w = int(
                hashlib.md5(f"{u}~{v}m".encode()).hexdigest()[:12], 16
            )
            seen[(u, v)] = w
    return sorted((w, u, v) for (u, v), w in seen.items())


def _kruskal(n_nodes, wedges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = set()
    for w, u, v in wedges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            out.add((u, v, w))
    return out


@pytest.mark.usefixtures("ray_session")
def test_boruvka_fixpoint_equals_kruskal():
    import ray.data as rd

    from marc2rdf_ray.ops.graph import boruvka_msf

    n = 300
    src, dst = _md5_edges(n)
    edges = rd.from_arrow(
        pa.table(
            {"src": pa.array(src, pa.int64()),
             "dst": pa.array(dst, pa.int64())}
        )
    )
    nodes = rd.from_arrow(
        pa.table({"node": pa.array(np.arange(n), pa.int64())})
    )

    got = boruvka_msf(edges, nodes, rounds=None).to_pandas()
    got_set = set(zip(got["src"], got["dst"], got["w"]))

    want = _kruskal(n, _canon_weighted(src, dst))
    assert got_set == want
    # spanning-forest size: n - #components
    from marc2rdf_ray.stages.canonicalize import _cc_numpy

    u = np.array([u for _, u, _v in _canon_weighted(src, dst)])
    # components over the undirected edge set plus isolated nodes
    cw = _canon_weighted(src, dst)
    uu = np.array([e[1] for e in cw] + list(range(n)))
    vv = np.array([e[2] for e in cw] + list(range(n)))
    _, roots = _cc_numpy(uu, vv)
    n_comp = len(np.unique(roots))
    assert len(got_set) == n - n_comp


@pytest.mark.usefixtures("ray_session")
def test_boruvka_fixed_rounds_subset_of_msf():
    """Every edge Boruvka selects in ANY round is an MSF edge (cut
    property under a strict total order), so the fixed-round partial
    forest must be a subset of the fixpoint forest."""
    import ray.data as rd

    from marc2rdf_ray.ops.graph import boruvka_msf

    n = 200
    src, dst = _md5_edges(n)
    edges = rd.from_arrow(
        pa.table(
            {"src": pa.array(src, pa.int64()),
             "dst": pa.array(dst, pa.int64())}
        )
    )
    nodes = rd.from_arrow(
        pa.table({"node": pa.array(np.arange(n), pa.int64())})
    )

    one = boruvka_msf(edges, nodes, rounds=1).to_pandas()
    full = boruvka_msf(edges, nodes, rounds=None).to_pandas()
    s1 = set(zip(one["src"], one["dst"], one["w"]))
    sf = set(zip(full["src"], full["dst"], full["w"]))
    assert s1 and s1 <= sf


@pytest.mark.usefixtures("ray_session")
def test_boruvka_rejects_wide_ids():
    import ray.data as rd

    from marc2rdf_ray.ops.graph import boruvka_msf

    edges = rd.from_arrow(
        pa.table(
            {"src": pa.array([1, 1 << 40], pa.int64()),
             "dst": pa.array([2, 3], pa.int64())}
        )
    )
    nodes = rd.from_arrow(pa.table({"node": pa.array([1, 2, 3], pa.int64())}))
    with pytest.raises(Exception):
        boruvka_msf(edges, nodes, rounds=1).to_pandas()
