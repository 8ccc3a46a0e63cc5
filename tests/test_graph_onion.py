"""Onion / degeneracy layering: hand-computed layers, including the
stranded-node corner (a survivor whose whole neighborhood peels must be
caught by the anti-join, not silently dropped)."""

import pyarrow as pa
import pytest


@pytest.mark.usefixtures("ray_session")
def test_onion_layers_hand_computed():
    import ray.data as rd

    from marc2rdf_ray.ops.graph import onion_layers

    # 4-clique {1,2,3,4} + pendant chain 1-5-6 + star 10-(11,12,13).
    # k=3: round 1 peels {5,6,11,12,13}; the star center 10 survives
    # round 1 (deg 3) but is stranded edge-less -> peels round 2 via
    # the anti-join path; the clique is the retained core (layer 4).
    src = [1, 1, 1, 2, 2, 3, 1, 5, 10, 10, 10]
    dst = [2, 3, 4, 3, 4, 4, 5, 6, 11, 12, 13]
    edges = rd.from_arrow(
        pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
            }
        )
    )
    got = {
        r["node"]: r["layer"]
        for r in onion_layers(edges, k=3, rounds=3).take_all()
    }
    assert got == {
        5: 1, 6: 1, 11: 1, 12: 1, 13: 1,
        10: 2,
        1: 4, 2: 4, 3: 4, 4: 4,
    }


@pytest.mark.usefixtures("ray_session")
def test_onion_layers_empty_core():
    import ray.data as rd

    from marc2rdf_ray.ops.graph import onion_layers

    # A path graph has no 3-core: everything peels in two rounds.
    edges = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([0, 1, 2, 3], pa.int64()),
                "dst": pa.array([1, 2, 3, 4], pa.int64()),
            }
        )
    )
    got = {
        r["node"]: r["layer"]
        for r in onion_layers(edges, k=3, rounds=3).take_all()
    }
    assert got == {0: 1, 1: 1, 2: 1, 3: 1, 4: 1}
