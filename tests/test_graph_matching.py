"""Greedy handshake matching: validity + maximality at the fixpoint."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest


def _md5_edges(n_nodes: int):
    src, dst = [], []
    for i in range(n_nodes):
        for k in range(i % 4):
            t = int(
                hashlib.md5(f"{i}:{k}".encode()).hexdigest()[:8], 16
            ) % n_nodes
            src.append(i)
            dst.append(t)
    return src, dst


@pytest.mark.usefixtures("ray_session")
def test_greedy_matching_valid_and_maximal():
    import ray.data as rd

    from marc2rdf_ray.ops.graph import greedy_matching

    n = 200
    src, dst = _md5_edges(n)
    edges = rd.from_arrow(
        pa.table(
            {"src": pa.array(src, pa.int64()),
             "dst": pa.array(dst, pa.int64())}
        )
    )
    got = greedy_matching(edges, rounds=12).to_pandas()

    # validity: no node appears twice
    nodes = np.concatenate([got["src"].to_numpy(), got["dst"].to_numpy()])
    assert len(nodes) == len(np.unique(nodes))

    # maximality: every undirected edge has a matched endpoint
    matched = set(nodes.tolist())
    und = {(min(s, d), max(s, d)) for s, d in zip(src, dst) if s != d}
    assert all(u in matched or v in matched for u, v in und)
