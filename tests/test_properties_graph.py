"""Property tests for the ninth-session ops: local SCC vs brute-force
mutual reachability, local MIS invariants (pure functions, hypothesis),
and seeded random-graph reference checks for onion layers and SCD2
(Ray-backed, few cases)."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

edge_lists = st.lists(
    st.tuples(st.integers(0, 11), st.integers(0, 11)),
    min_size=1, max_size=40,
)


def _scc_brute(pairs):
    """Mutual-reachability closure -> min-member labels."""
    nodes = sorted({x for p in pairs for x in p if p[0] != p[1]})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    reach = np.eye(n, dtype=bool)
    for s, d in pairs:
        if s != d:
            reach[idx[s], idx[d]] = True
    for k in range(n):
        reach |= reach[:, k][:, None] & reach[k, :][None, :]
    out = {}
    for i, v in enumerate(nodes):
        comp = [nodes[j] for j in range(n) if reach[i, j] and reach[j, i]]
        out[v] = min(comp + [v])
    return out


class TestLocalSCCProperties:
    @given(edge_lists)
    @settings(max_examples=150, deadline=None)
    def test_matches_mutual_reachability(self, pairs):
        from marc2rdf_ray.ops.graph import _scc_solve_local

        g = pa.table(
            {
                "src": pa.array([p[0] for p in pairs], pa.int64()),
                "dst": pa.array([p[1] for p in pairs], pa.int64()),
            }
        )
        got = {
            r["node"]: r["scc"]
            for r in _scc_solve_local(g).to_pylist()
        }
        assert got == _scc_brute(pairs)


class TestLocalMISProperties:
    @given(edge_lists)
    @settings(max_examples=100, deadline=None)
    def test_fixpoint_independent_and_maximal(self, pairs):
        from marc2rdf_ray.ops.graph import _mis_solve_local

        simple = {(min(s, d), max(s, d)) for s, d in pairs if s != d}
        if not simple:
            return
        g = pa.table(
            {
                "u": pa.array([p[0] for p in simple], pa.int64()),
                "v": pa.array([p[1] for p in simple], pa.int64()),
            }
        )
        mis = set(_mis_solve_local(g, None, 30)["node"].to_pylist())
        adj = {}
        nodes = set()
        for u, v in simple:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
            nodes |= {u, v}
        assert mis and mis <= nodes
        for x in mis:
            assert not (adj[x] & mis)
        for x in nodes - mis:
            assert adj[x] & mis

    @given(edge_lists, st.integers(1, 4))
    @settings(max_examples=60, deadline=None)
    def test_fixed_rounds_prefix_of_fixpoint(self, pairs, r):
        from marc2rdf_ray.ops.graph import _mis_solve_local

        simple = {(min(s, d), max(s, d)) for s, d in pairs if s != d}
        if not simple:
            return
        g = pa.table(
            {
                "u": pa.array([p[0] for p in simple], pa.int64()),
                "v": pa.array([p[1] for p in simple], pa.int64()),
            }
        )
        part = set(_mis_solve_local(g, r, 30)["node"].to_pylist())
        full = set(_mis_solve_local(g, None, 30)["node"].to_pylist())
        assert part <= full


def _onion_brute(pairs, k, rounds):
    simple = {(min(s, d), max(s, d)) for s, d in pairs if s != d}
    layers = {}
    alive_edges = set(simple)
    surv = {x for p in simple for x in p}
    for r in range(1, rounds + 1):
        deg = {}
        for u, v in alive_edges:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        keep = {x for x in surv if deg.get(x, 0) >= k}
        for x in surv - keep:
            layers[x] = r
        surv = keep
        alive_edges = {
            (u, v) for u, v in alive_edges if u in keep and v in keep
        }
    for x in surv:
        layers[x] = rounds + 1
    return layers


@pytest.mark.usefixtures("ray_session")
def test_onion_layers_random_graphs():
    import ray.data as rd

    from marc2rdf_ray.ops.graph import onion_layers

    rng = np.random.RandomState(7)
    for _ in range(5):
        m = rng.randint(5, 40)
        src = rng.randint(0, 15, m).tolist()
        dst = rng.randint(0, 15, m).tolist()
        pairs = list(zip(src, dst))
        ds = rd.from_arrow(
            pa.table(
                {
                    "src": pa.array(src, pa.int64()),
                    "dst": pa.array(dst, pa.int64()),
                }
            )
        )
        got = {
            r["node"]: r["layer"]
            for r in onion_layers(ds, k=2, rounds=3).take_all()
        }
        assert got == _onion_brute(pairs, 2, 3), pairs


def _scd2_brute(rows, max_v):
    by_key = {}
    for i, a, v in rows:
        by_key.setdefault(i, []).append((v, a))
    out = set()
    for i, vs in by_key.items():
        vs.sort()
        run_from = run_a = prev_v = None
        for v, a in vs:
            if prev_v is not None and v == prev_v + 1 and a == run_a:
                prev_v = v
                continue
            if prev_v is not None:
                out.add((i, run_a, run_from, prev_v + 1, 0))
            run_from, run_a, prev_v = v, a, v
        if prev_v is not None:
            if prev_v == max_v:
                out.add((i, run_a, run_from, None, 1))
            else:
                out.add((i, run_a, run_from, prev_v + 1, 0))
    return out


@pytest.mark.usefixtures("ray_session")
def test_scd2_random_series():
    import ray.data as rd

    from marc2rdf_ray.ops.relational import scd2_intervals

    rng = np.random.RandomState(11)
    for _ in range(5):
        rows = []
        for key in range(8):
            for v in range(4):
                if rng.rand() < 0.7:
                    rows.append((key, rng.choice(["A", "B"]), v))
        if not rows:
            continue
        ds = rd.from_arrow(
            pa.table(
                {
                    "id": pa.array([r[0] for r in rows], pa.int64()),
                    "st": pa.array([r[1] for r in rows], pa.string()),
                    "v": pa.array([r[2] for r in rows], pa.int64()),
                }
            )
        )
        got = {
            (r["id"], r["st"], r["eff_from"], r["eff_to"],
             r["is_current"])
            for r in scd2_intervals(
                ds, id_col="id", attr_cols=["st"], version_col="v",
                max_version=3,
            ).take_all()
        }
        assert got == _scd2_brute(rows, 3), rows
