"""Iterative graph algorithms over edge tables: integer-exact PageRank.

The KG the flagship pipeline materializes is a directed graph (page ->
mentioned entity, page -> linked page); ranking its nodes is the classic
"which entities matter" wide operation that Ray Data lacks natively.  This
is the custom-operator composition (a) of SURVEY.md §2: per-round, TWO
bucketed exchanges (the connected-components pattern in
stages/canonicalize.py:271) with all per-bucket work done by Arrow C++
kernels -- no Python per node, per edge, or per group.

**Integer-exact by construction.**  Float PageRank is not replayable
across engines (summation order changes the low bits and a rank SORT can
then differ), so ranks live in integer micro-units of ``scale``
(default 1e12) and every step is order-independent integer arithmetic:

    base      = scale // n_nodes
    contrib_e = r[src] // outdeg[src]          (per edge, floor)
    share     = (sum of r over dangling) // n_nodes
    r'[v]     = ((den-num)*base + num*(in_sum[v] + share)) // den

with damping num/den = 85/100.  Sums of non-negative int64 are associative
and commutative, so the Ray result is bit-identical to a single-threaded
replay -- and to the DuckDB oracle that unrolls the same recurrence
(entry_queries.oracle: ``doc_pagerank``).  Rank mass is conserved up to
the deterministic floor losses both sides share.

Scale design (100 TB / 1e12 nodes):
- edges are read ONCE, bucketed by hash(src); ranks are the only per-round
  state (one small row per node), repartitioned to a bounded block count
  per round (sort shuffles emit as many blocks as they receive -- without
  the bound the union per round compounds block counts; NOTES.md).
- hot destinations (a node with 1e9 in-links) are defused by a per-task
  combiner: each exchange-1 task pre-sums contributions per dst, so the
  second exchange carries at most #distinct-dst rows per task, and the
  final per-bucket sum is a vectorized Arrow aggregate.
- the per-round dangling mass is a single int64 reduced to the driver
  (O(1) driver state -- not a driver-side loop over nodes).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _bucket_ints(arr, num_buckets: int) -> pa.Array:
    """node_id % num_buckets as int32 (cheap deterministic shuffle key for
    integer node ids; contiguous ids spread uniformly)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    v = arr.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    return pa.array((v % num_buckets).astype(np.int32), pa.int32())


def pagerank(
    edges_ds,
    nodes_ds,
    *,
    iterations: int = 5,
    scale: int = 10**12,
    damping_num: int = 85,
    damping_den: int = 100,
    num_buckets: int | None = None,
):
    """PageRank over ``edges_ds`` (src:int64, dst:int64; parallel edges
    count twice) for the node set ``nodes_ds`` (node:int64, one row per
    node, including isolated/dangling nodes).  Returns a Dataset of
    (node:int64, rank:int64) where rank is in 1/scale units.

    ``iterations`` is fixed (no convergence test): deterministic cost,
    deterministic output, SQL-replayable.
    """
    n_nodes = nodes_ds.count()
    if num_buckets is None:
        # size the exchange to the DATA, capped by the cluster: each round
        # runs two bucketed all-to-alls whose fixed per-task cost dominates
        # when buckets hold only a few thousand rows (observed 36 s for a
        # 5k-node graph at 64 buckets vs seconds at 4).  ~50k nodes per
        # bucket keeps per-bucket Arrow work in the efficient range; the
        # 2xCPU cap grows with the cluster, so at 1e9+ nodes buckets scale
        # out exactly as before.
        try:
            import ray

            cpu_cap = max(16, int(ray.cluster_resources().get("CPU", 8)) * 2)
        except Exception:
            cpu_cap = 16
        num_buckets = max(4, min(cpu_cap, (n_nodes + 49_999) // 50_000))

    if not n_nodes:
        return nodes_ds.map_batches(
            lambda b: pa.table(
                {"node": pa.array([], pa.int64()), "rank": pa.array([], pa.int64())}
            ),
            batch_format="pyarrow",
        )
    base = scale // n_nodes
    comp_num = damping_den - damping_num

    # -- static: edges bucketed by src, with a per-batch combiner assist --
    def edge_prep(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "key": pc.cast(b["src"], pa.int64()),
                "dst": pc.cast(b["dst"], pa.int64()),
            }
        )
        return t.append_column("bucket", _bucket_ints(t["key"], num_buckets))

    edges = edges_ds.map_batches(edge_prep, batch_format="pyarrow").materialize()

    # -- outdegree: per-batch partial counts, one bucketed exchange -------
    def deg_partial(b: pa.Table) -> pa.Table:
        t = (
            b.select(["key"])
            .group_by(["key"], use_threads=False)
            .aggregate([("key", "count")])
            .rename_columns(["key", "cnt"])
        )
        t = pa.table({"key": t["key"], "cnt": pc.cast(t["cnt"], pa.int64())})
        return t.append_column("bucket", _bucket_ints(t["key"], num_buckets))

    def node_zero(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "key": pc.cast(b["node"], pa.int64()),
                "cnt": pa.array([0] * len(b), pa.int64()),
            }
        )
        return t.append_column("bucket", _bucket_ints(t["key"], num_buckets))

    def bucket_deg(group: pa.Table) -> pa.Table:
        t = (
            group.select(["key", "cnt"])
            .group_by(["key"], use_threads=False)
            .aggregate([("cnt", "sum")])
            .rename_columns(["node", "outdeg"])
        )
        return pa.table(
            {
                "node": t["node"],
                "r": pa.array([base] * len(t), pa.int64()),
                "outdeg": pc.cast(t["outdeg"], pa.int64()),
            }
        )

    ranks = (
        edges.map_batches(deg_partial, batch_format="pyarrow")
        .union(nodes_ds.map_batches(node_zero, batch_format="pyarrow"))
        .groupby("bucket")
        .map_groups(bucket_deg, batch_format="pyarrow")
        .repartition(num_buckets)
        .materialize()
    )

    # -- per-round stages --------------------------------------------------
    def rank_tag(b: pa.Table) -> pa.Table:
        # rank rows into exchange 1 (joined to edges by key=node=src)
        t = pa.table(
            {
                "key": b["node"],
                "dst": pa.array([None] * len(b), pa.int64()),
                "r": b["r"],
                "outdeg": b["outdeg"],
                "kind": pa.array([1] * len(b), pa.int8()),
            }
        )
        return t.append_column("bucket", _bucket_ints(t["key"], num_buckets))

    def edge_tag(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "key": b["key"],
                "dst": b["dst"],
                "r": pa.array([None] * len(b), pa.int64()),
                "outdeg": pa.array([None] * len(b), pa.int64()),
                "kind": pa.array([0] * len(b), pa.int8()),
            }
        )
        return t.append_column("bucket", b["bucket"])

    def bucket_contrib(group: pa.Table) -> pa.Table:
        """Join rank rows onto edge rows by src; pre-sum per dst (combiner:
        defuses hot destinations before the second exchange)."""
        kind = group["kind"]
        rk = group.filter(pc.equal(kind, 1))
        ed = group.filter(pc.equal(kind, 0))
        if not len(ed):
            return pa.table(
                {"key": pa.array([], pa.int64()), "c": pa.array([], pa.int64())}
            )
        # exact int64 floor division in numpy (float64 division + floor
        # mis-floors once outdeg exceeds ~1e4 at scale=1e12): only srcs
        # with >=1 edge survive the inner join, so outdeg >= 1 there --
        # clamp solely to keep the vectorized divide total.
        r_np = rk["r"].combine_chunks().to_numpy(zero_copy_only=False)
        d_np = rk["outdeg"].combine_chunks().to_numpy(zero_copy_only=False)
        contrib = r_np.astype(np.int64) // np.maximum(d_np.astype(np.int64), 1)
        rk_tbl = pa.table(
            {"key": rk["key"], "contrib": pa.array(contrib, pa.int64())}
        )
        j = pa.table({"key": ed["key"], "dst": ed["dst"]}).join(
            rk_tbl, keys="key", join_type="inner", use_threads=False
        )
        out = (
            pa.table({"key": j["dst"], "c": j["contrib"]})
            .group_by(["key"], use_threads=False)
            .aggregate([("c", "sum")])
            .rename_columns(["key", "c"])
        )
        return pa.table({"key": out["key"], "c": pc.cast(out["c"], pa.int64())})

    def contrib_key(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "key": b["key"],
                "c": b["c"],
                "outdeg": pa.array([None] * len(b), pa.int64()),
                "kind": pa.array([0] * len(b), pa.int8()),
            }
        )
        return t.append_column("bucket", _bucket_ints(t["key"], num_buckets))

    def rank_state(b: pa.Table) -> pa.Table:
        """Rank rows into exchange 2, PLUS this batch's dangling-mass
        partial broadcast to every bucket (kind=2): each bucket then sums
        an identical copy of the global dangling mass locally, so no
        separate driver-synchronized reduction pass is needed per round
        (it was a full extra Dataset execution -- half the round's jobs)."""
        t = pa.table(
            {
                "key": b["node"],
                "c": pa.array([0] * len(b), pa.int64()),
                "outdeg": b["outdeg"],
                "kind": pa.array([1] * len(b), pa.int8()),
            }
        )
        t = t.append_column("bucket", _bucket_ints(t["key"], num_buckets))
        dang = pc.sum(
            pc.if_else(pc.equal(b["outdeg"], 0), b["r"], pa.scalar(0, pa.int64()))
        ).as_py() or 0
        bcast = pa.table(
            {
                "key": pa.array([None] * num_buckets, pa.int64()),
                "c": pa.array([dang] * num_buckets, pa.int64()),
                "outdeg": pa.array([None] * num_buckets, pa.int64()),
                "kind": pa.array([2] * num_buckets, pa.int8()),
                "bucket": pa.array(range(num_buckets), pa.int32()),
            }
        )
        return pa.concat_tables([t, bcast])

    def bucket_update(group: pa.Table) -> pa.Table:
        kind = group["kind"]
        # kind=2 rows: every batch's dangling partial, broadcast here --
        # their local sum IS the global dangling mass
        dang = pc.sum(
            pc.if_else(pc.equal(kind, 2), group["c"], pa.scalar(0, pa.int64()))
        ).as_py() or 0
        share = dang // n_nodes
        g = group.filter(pc.not_equal(kind, 2))
        t = (
            g.select(["key", "c", "outdeg"])
            .group_by(["key"], use_threads=False)
            .aggregate([("c", "sum"), ("outdeg", "max")])
            .rename_columns(["node", "in_sum", "outdeg"])
        )
        # nodes arriving only via contrib rows (not in the node set)
        # have null outdeg -- drop them: the node universe is fixed.
        t = t.filter(pc.is_valid(t["outdeg"]))
        # exact integer arithmetic (see bucket_contrib note)
        in_np = (
            t["in_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        r_new = (comp_num * base + damping_num * (in_np + share)) // damping_den
        return pa.table(
            {
                "node": t["node"],
                "r": pa.array(r_new, pa.int64()),
                "outdeg": t["outdeg"],
            }
        )

    for _ in range(iterations):
        contribs = (
            edges.map_batches(edge_tag, batch_format="pyarrow")
            .union(ranks.map_batches(rank_tag, batch_format="pyarrow"))
            .groupby("bucket")
            .map_groups(bucket_contrib, batch_format="pyarrow")
        )
        ranks = (
            contribs.map_batches(contrib_key, batch_format="pyarrow")
            .union(ranks.map_batches(rank_state, batch_format="pyarrow"))
            .groupby("bucket")
            .map_groups(bucket_update, batch_format="pyarrow")
            .repartition(num_buckets)
            .materialize()
        )

    return ranks.map_batches(
        lambda b: pa.table({"node": b["node"], "rank": b["r"]}),
        batch_format="pyarrow",
    )


def pagerank_reference(
    edges: list[tuple[int, int]],
    nodes: list[int],
    *,
    iterations: int = 5,
    scale: int = 10**12,
    damping_num: int = 85,
    damping_den: int = 100,
) -> dict[int, int]:
    """Single-threaded replay of the exact integer recurrence (the
    differential-test oracle; also documents the contract)."""
    n = len(nodes)
    base = scale // n
    comp = damping_den - damping_num
    outdeg: dict[int, int] = {v: 0 for v in nodes}
    for s, _ in edges:
        outdeg[s] += 1
    r = {v: base for v in nodes}
    for _ in range(iterations):
        dang = sum(rv for v, rv in r.items() if outdeg[v] == 0)
        share = dang // n
        in_sum = {v: 0 for v in nodes}
        for s, d in edges:
            in_sum[d] += r[s] // outdeg[s]
        r = {
            v: (comp * base + damping_num * (in_sum[v] + share)) // damping_den
            for v in nodes
        }
    return r
