"""Guard paths and hand-computed fixtures for eighth-session ops."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.mark.usefixtures("ray_session")
def test_decayed_score_rejects_negative_values():
    import datetime as dt

    import ray.data as rd

    from marc2rdf_ray.ops.windows import decayed_group_score

    ds = rd.from_items(
        [
            {"k": 1, "ts": dt.datetime(2024, 1, 1), "v": -1.0},
            {"k": 1, "ts": dt.datetime(2024, 1, 2), "v": 2.0},
        ]
    )
    with pytest.raises(Exception):
        decayed_group_score(
            ds, key_col="k", ts_col="ts", value_col="v"
        ).take_all()


@pytest.mark.usefixtures("ray_session")
def test_decayed_score_hand_computed():
    import datetime as dt

    import ray.data as rd

    from marc2rdf_ray.ops.windows import decayed_group_score

    # horizon = 02:30; ages 2.5h and 0h -> shifts 2 and 0
    ds = rd.from_items(
        [
            {"k": 7, "ts": dt.datetime(2024, 1, 1, 0, 0), "v": 8.0},
            {"k": 7, "ts": dt.datetime(2024, 1, 1, 2, 30), "v": 3.0},
        ]
    )
    got = decayed_group_score(
        ds, key_col="k", ts_col="ts", value_col="v"
    ).take_all()
    # 8000 >> 2 = 2000; 3000 >> 0 = 3000
    assert got == [{"k": 7, "decayed_units": 5000}]


@pytest.mark.usefixtures("ray_session")
def test_dag_layers_hand_graph():
    import ray.data as rd

    from marc2rdf_ray.ops.graph import dag_longest_path_layers

    # path 0->1->2->3 plus shortcut 0->2: layer = longest path
    edges = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([0, 1, 2, 0], pa.int64()),
                "dst": pa.array([1, 2, 3, 2], pa.int64()),
            }
        )
    )
    got = {
        r["node"]: r["layer"]
        for r in dag_longest_path_layers(edges, rounds=4).take_all()
    }
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


@pytest.mark.usefixtures("ray_session")
def test_containment_search_threshold_edges():
    import ray.data as rd

    from marc2rdf_ray.ops.dedup import containment_search

    probe = {"a", "b", "c", "d", "e"}  # 5 tokens; 60% -> need >= 3
    ds = rd.from_items(
        [
            {"doc_id": 1, "text": "a b c x"},      # 3/5 = 60 -> keep
            {"doc_id": 2, "text": "a b x y"},      # 2/5 -> drop
            {"doc_id": 3, "text": "a b c d e"},    # 5/5 -> keep
            {"doc_id": 0, "text": "a b c d e"},    # excluded probe id
        ]
    )
    got = sorted(
        (r["doc_id"], r["containment_pct"])
        for r in containment_search(
            ds, probe, threshold_pct=60, exclude_id=0
        ).take_all()
    )
    assert got == [(1, 60), (3, 100)]


@pytest.mark.usefixtures("ray_session")
def test_shuffle_rank_dense_and_deterministic():
    import ray.data as rd

    from marc2rdf_ray.ops.corpus import deterministic_shuffle_rank

    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(np.arange(100), pa.int64())})
    )
    got = deterministic_shuffle_rank(ds).take_all()
    ranks = sorted(r["rank"] for r in got)
    assert ranks == list(range(100))
    again = deterministic_shuffle_rank(
        rd.from_arrow(
            pa.table({"doc_id": pa.array(np.arange(100), pa.int64())})
        )
    ).take_all()
    assert sorted(map(tuple, (r.items() for r in got))) == sorted(
        map(tuple, (r.items() for r in again))
    )
