"""Similarity search over an embedding column (list<float>).

- ``brute_topk``: exact cosine top-k.  The query matrix is broadcast
  (``ray.put`` once -> read in every task); each batch does one float64
  matmul against it and emits its local top-k per query; a final tiny
  groupby merges the partials.  Shuffle volume: k rows per query per batch,
  never the embeddings.
- ``lsh_topk``: the scale path -- signed-random-hyperplane buckets
  restrict candidates to the query's bucket (and its 1-bit neighbors),
  then exact cosine within candidates.  Recall is tested against brute
  force in tests/test_ops.py.

Scores are computed in float64 and rounded to 4 decimals so they are
reproducible against a DuckDB ``list_cosine_similarity`` oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def vecs_to_matrix(col) -> np.ndarray:
    """Columnar ``list<float>`` -> ``(n, d)`` float64 with NO per-row
    Python: flatten the list child buffer and reshape when the lists are
    rectangular (this table's schema always is); ragged or null-bearing
    input falls back to ``to_pylist``.  Values are bit-identical to the
    fallback, so every ANN oracle is unaffected."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    try:
        if n and col.null_count == 0:
            lens = pc.list_value_length(col)
            lo = pc.min_max(lens).as_py()
            if lo["min"] == lo["max"] and lo["min"] is not None:
                d = int(lo["min"])
                flat = pc.list_flatten(col)
                if flat.null_count == 0 and len(flat) == n * d:
                    return (
                        flat.to_numpy(zero_copy_only=False)
                        .astype(np.float64, copy=False)
                        .reshape(n, d)
                    )
    except Exception:  # pragma: no cover - defensive fallback
        pass
    return np.array(col.to_pylist(), dtype=np.float64)


def _unit(mat: np.ndarray) -> np.ndarray:
    mat = np.asarray(mat, dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return mat / norms[:, None]


class _BruteScorer:
    """Per-batch scorer; query matrix fetched once per actor (broadcast)."""

    def __init__(self, queries_ref, k: int, id_col: str, vec_col: str):
        import ray

        q = (
            ray.get(queries_ref)
            if isinstance(queries_ref, ray.ObjectRef)
            else queries_ref
        )
        self.qids = np.asarray(q["qid"])
        self.qmat = _unit(np.asarray(q["mat"], dtype=np.float64)).T  # (d, nq)
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[self.id_col].to_pylist())
        mat = _unit(vecs_to_matrix(batch[self.vec_col]))
        sims = mat @ self.qmat  # (n, nq)
        k = min(self.k, len(ids))
        out_q, out_id, out_s = [], [], []
        for j, qid in enumerate(self.qids):
            col = sims[:, j]
            top = np.argpartition(-col, k - 1)[:k] if k < len(ids) else np.arange(len(ids))
            for i in top:
                out_q.append(int(qid))
                out_id.append(int(ids[i]))
                out_s.append(round(float(col[i]), 4))
        return pa.table(
            {
                "qid": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_id, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )


def brute_topk(
    ds,
    query_ids: list[int],
    query_mat: np.ndarray,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Exact cosine top-k of every query against the dataset."""
    import ray

    ref = ray.put({"qid": list(query_ids), "mat": np.asarray(query_mat)})

    partial = ds.map_batches(
        _BruteScorer(ref, k, id_col, vec_col), batch_format="pyarrow"
    )

    def merge(group: pa.Table) -> pa.Table:
        t = group.sort_by([("score", "descending"), ("vec_id", "ascending")])
        return t.slice(0, k)

    return partial.groupby("qid").map_groups(merge, batch_format="pyarrow")


def _quantized_sign_planes(dim: int, num_planes: int) -> np.ndarray:
    """±1 'hyperplanes' from md5 parity -- deterministic without shipping a
    seed, and integer-exact: bucketing quantizes vectors to
    floor(x*2^20+0.5) int64 and takes sign of an INTEGER dot product, so
    bucket codes are bit-identical across numpy, a SQL oracle, and any
    future engine (float summation order can flip the sign of a
    near-zero projection; integers cannot)."""
    from .dedup import md5_u64

    s = np.empty((dim, num_planes), np.int64)
    for p in range(num_planes):
        for d in range(dim):
            s[d, p] = 1 if (md5_u64(f"plane:{p}:{d}") & 1) else -1
    return s


_QUANT = 1 << 20


def _quantize(mat: np.ndarray) -> np.ndarray:
    return np.floor(mat * _QUANT + 0.5).astype(np.int64)


def ivf_topk(
    ds,
    query_ids: list[int],
    query_mat: np.ndarray,
    centroid_mat: np.ndarray,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 2,
):
    """IVF-flat approximate top-k: vectors are assigned to their nearest
    coarse centroid (inverted lists); a query searches only the ``nprobe``
    nearest lists, with exact cosine rerank.

    Assignment uses INTEGER-quantized L2 (floor(x*2^20+0.5), int64 sums:
    order-free, overflow-safe at 64 dims) so list membership is
    bit-identical across numpy and a SQL oracle -- float L2 argmin can
    flip on summation-order ulps.  Centroids here are sampled data vectors
    (IVF with random init, no Lloyd refinement -- the standard cheap
    variant); at scale you'd train them on a sample and broadcast, which
    changes nothing structurally.  Shuffle volume: k rows per query per
    batch (same partial-top-k merge as brute_topk), centroids broadcast."""
    import ray

    cq = _quantize(np.asarray(centroid_mat, np.float64))  # (C, d)
    qmat = np.asarray(query_mat, dtype=np.float64)

    def assign(q: np.ndarray) -> np.ndarray:
        # (n, C) integer squared distances; argmin = first (lowest cid) tie
        d2 = ((q[:, None, :] - cq[None, :, :]) ** 2).sum(axis=2)
        return d2

    qq = _quantize(qmat)
    qd2 = assign(qq)
    # nprobe nearest lists per query, ties -> lower centroid id
    order = np.lexsort((np.tile(np.arange(cq.shape[0]), (len(qq), 1)), qd2))
    # (nq, C) boolean probe matrix: membership per batch row is then one
    # vectorized gather, never a Python `in` per row
    probe_mask = np.zeros((len(qq), cq.shape[0]), bool)
    for qi in range(len(qq)):
        probe_mask[qi, order[qi, :nprobe]] = True
    ref = ray.put(
        {"qid": list(query_ids), "mat": qmat, "probe": probe_mask, "cq": cq}
    )

    class Scorer:
        def __init__(self):
            q = ray.get(ref)
            self.qids = q["qid"]
            self.qunit = _unit(q["mat"])
            self.probe = q["probe"]
            self.cq = q["cq"]

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch[id_col].to_pylist())
            raw = vecs_to_matrix(batch[vec_col])
            d2 = ((_quantize(raw)[:, None, :] - self.cq[None, :, :]) ** 2).sum(axis=2)
            cid = np.argmin(d2, axis=1)  # first occurrence = lowest cid
            mat = _unit(raw)
            out_q, out_id, out_s = [], [], []
            for qi, qid in enumerate(self.qids):
                sel = self.probe[qi][cid]
                if not sel.any():
                    continue
                sims = mat[sel] @ self.qunit[qi]
                for i, s in zip(ids[sel], sims):
                    out_q.append(int(qid))
                    out_id.append(int(i))
                    out_s.append(round(float(s), 4))
            return pa.table(
                {
                    "qid": pa.array(out_q, pa.int64()),
                    "vec_id": pa.array(out_id, pa.int64()),
                    "score": pa.array(out_s, pa.float64()),
                }
            )

    partial = ds.map_batches(Scorer, batch_format="pyarrow", concurrency=2)

    def merge(group: pa.Table) -> pa.Table:
        t = group.sort_by([("score", "descending"), ("vec_id", "ascending")])
        return t.slice(0, k)

    return partial.groupby("qid").map_groups(merge, batch_format="pyarrow")


def lsh_topk(
    ds,
    query_ids: list[int],
    query_mat: np.ndarray,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 8,
    probe_bits: int = 1,
):
    """Approximate top-k: candidates share the query's hyperplane bucket or
    differ in <= probe_bits bits (multi-probe).  One shuffle on bucket id;
    probe_bits trades recall for candidate volume.  Buckets come from
    integer-quantized md5-sign planes (see _quantized_sign_planes), making
    the FULL candidate pipeline replayable by a SQL oracle."""
    import itertools

    import ray

    qmat = np.asarray(query_mat, dtype=np.float64)
    dim = qmat.shape[1]
    planes = _quantized_sign_planes(dim, num_planes)

    def bucket_of(mat: np.ndarray) -> np.ndarray:
        bits = (_quantize(np.asarray(mat, np.float64)) @ planes > 0).astype(np.int64)
        return (bits * (1 << np.arange(num_planes))).sum(axis=1)

    qb = bucket_of(qmat)
    probe: dict[int, list[int]] = {}
    for qi, b in enumerate(qb):
        probe.setdefault(int(b), []).append(qi)
        for r in range(1, probe_bits + 1):
            for bits in itertools.combinations(range(num_planes), r):
                flip = 0
                for bit in bits:
                    flip |= 1 << bit
                probe.setdefault(int(b) ^ flip, []).append(qi)
    # per-query sorted probe-bucket arrays: candidate selection per batch
    # is then one np.isin per query, never a Python dict probe per row
    probe_by_q = [[] for _ in query_ids]
    for b, qis in probe.items():
        for qi in qis:
            probe_by_q[qi].append(b)
    probe_arrs = [np.unique(np.asarray(bs, np.int64)) for bs in probe_by_q]
    ref = ray.put({"qid": list(query_ids), "mat": qmat, "probe": probe_arrs})

    class Scorer:
        def __init__(self):
            q = ray.get(ref)
            self.qids = q["qid"]
            self.qunit = _unit(q["mat"])
            self.probe = q["probe"]

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch[id_col].to_pylist())
            mat = _unit(vecs_to_matrix(batch[vec_col]))
            buckets = bucket_of(mat)
            out_q, out_id, out_s = [], [], []
            for qi, qid in enumerate(self.qids):
                sel = np.isin(buckets, self.probe[qi])
                if not sel.any():
                    continue
                sims = mat[sel] @ self.qunit[qi]
                for i, s in zip(ids[sel], sims):
                    out_q.append(int(qid))
                    out_id.append(int(i))
                    out_s.append(round(float(s), 4))
            return pa.table(
                {
                    "qid": pa.array(out_q, pa.int64()),
                    "vec_id": pa.array(out_id, pa.int64()),
                    "score": pa.array(out_s, pa.float64()),
                }
            )

    partial = ds.map_batches(Scorer, batch_format="pyarrow", concurrency=2)

    def merge(group: pa.Table) -> pa.Table:
        t = group.sort_by([("score", "descending"), ("vec_id", "ascending")])
        return t.slice(0, k)

    return partial.groupby("qid").map_groups(merge, batch_format="pyarrow")


def kmeans_quantized(
    ds,
    *,
    n_clusters: int = 8,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Deterministic integer-exact Lloyd k-means (the trained-quantizer
    upgrade over ivf_topk's sampled centroids).

    Every step is order-independent integer arithmetic, so the result is
    bit-identical across numpy, any task-execution order, and the DuckDB
    oracle that unrolls the same recurrence (entry_queries:
    ``embeddings_kmeans``):

    - vectors quantize to floor(x * 2^20 + 0.5) int64,
    - assignment = argmin of integer squared L2 (ties -> lowest cluster id),
    - update = elementwise floor(sum / count) (empty cluster keeps its
      previous centroid),
    - init = the ``n_clusters`` vectors with the smallest ids (at scale:
      a deterministic sample, broadcast -- structurally identical).

    Scale shape: centroids are O(C*d) driver state broadcast per round via
    ``ray.put``; each round is ONE ``map_batches`` pass emitting C partial
    (count, sum-vector) rows per batch -- the classic combiner, no shuffle
    of the vectors themselves.  Returns (centroids_q int64 (C, d),
    assignment Dataset (id_col, cluster:int32))."""
    import ray

    # init = the n_clusters vectors with the TRUE smallest ids: per-batch
    # partial top-k by id, then a driver-side merge -- correct for sparse /
    # offset id spaces, not just dense 0-based ones (ADVICE r2).  Shuffle
    # volume is O(k) rows per batch.
    def smallest_ids(b: pa.Table) -> pa.Table:
        t = pa.table({id_col: b[id_col], vec_col: b[vec_col]})
        return t.sort_by([(id_col, "ascending")]).slice(0, n_clusters)

    init_tab = ds.map_batches(smallest_ids, batch_format="pyarrow").take_all()
    if not init_tab:
        raise ValueError(
            f"kmeans_quantized: input dataset has no vectors in {vec_col!r}"
        )
    init_tab.sort(key=lambda r: r[id_col])
    init_tab = init_tab[:n_clusters]
    cents = _quantize(
        np.array([r[vec_col] for r in init_tab], dtype=np.float64)
    )
    n_clusters = cents.shape[0]

    def make_partial(cents_ref):
        def partial(b: pa.Table) -> pa.Table:
            q = ray.get(cents_ref)
            vq = _quantize(vecs_to_matrix(b[vec_col]))
            d2 = ((vq[:, None, :] - q[None, :, :]) ** 2).sum(axis=2)
            cid = np.argmin(d2, axis=1)  # first occurrence = lowest cid
            counts = np.bincount(cid, minlength=n_clusters)
            sums = np.zeros((n_clusters, vq.shape[1]), np.int64)
            np.add.at(sums, cid, vq)
            return pa.table(
                {
                    "cluster": pa.array(np.arange(n_clusters, dtype=np.int32)),
                    "cnt": pa.array(counts.astype(np.int64)),
                    "sums": pa.array(list(sums), pa.list_(pa.int64())),
                }
            )

        return partial

    for _ in range(iterations):
        ref = ray.put(cents)
        parts = ds.map_batches(
            make_partial(ref), batch_format="pyarrow"
        ).take_all()
        counts = np.zeros(n_clusters, np.int64)
        sums = np.zeros_like(cents)
        for row in parts:
            counts[row["cluster"]] += row["cnt"]
            sums[row["cluster"]] += np.asarray(row["sums"], np.int64)
        nonempty = counts > 0
        new = cents.copy()
        # numpy // floors (matches the oracle's offset-division floor)
        new[nonempty] = sums[nonempty] // counts[nonempty, None]
        cents = new

    final_ref = ray.put(cents)

    def assign(b: pa.Table) -> pa.Table:
        q = ray.get(final_ref)
        vq = _quantize(vecs_to_matrix(b[vec_col]))
        d2 = ((vq[:, None, :] - q[None, :, :]) ** 2).sum(axis=2)
        cid = np.argmin(d2, axis=1)
        return pa.table(
            {
                id_col: b[id_col],
                "cluster": pa.array(cid.astype(np.int32)),
            }
        )

    return cents, ds.map_batches(assign, batch_format="pyarrow")


def knn_graph(
    ds,
    k: int = 2,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Exact cosine k-nearest-neighbor GRAPH (self-join): every vector's
    top-``k`` neighbors (self excluded), ties broken by neighbor id
    ascending -> Dataset ``(qid, nbr, score)`` with score rounded to 4
    decimals at emit (ordering uses full precision, like the oracle).

    Blocked-GEMM shape (exact kNN is inherently O(n^2) compute; the
    design bounds MEMORY and parallelizes the work): the corpus is
    materialized once, sorted by id into the object store, and every
    scoring task streams the sorted blocks one at a time (``ray.get``
    per block, zero-copy) against its own batch, folding a running
    top-``k`` per row between blocks -- worker memory is
    O(batch x block), never O(n^2) and never the whole matrix unless it
    is one block.  Tie correctness without per-row Python: blocks arrive
    id-ascending and every 2D ``argsort`` is stable, so equal scores
    resolve to the smaller id by construction.  The approximate scale
    path for larger corpora is :func:`ivf_topk`'s cell-bucketed candidate
    generation (documented there); this is the exact baseline.
    """
    import ray

    sorted_ds = ds.sort(id_col).materialize()
    block_refs = list(sorted_ds.to_arrow_refs())

    class Scorer:
        def __init__(self):
            self.blocks = block_refs

        def __call__(self, batch: pa.Table) -> pa.Table:
            qids = np.asarray(batch[id_col].to_pylist(), np.int64)
            qmat = _unit(vecs_to_matrix(batch[vec_col]))
            nq = len(qids)
            kk = k
            best_s = np.full((nq, 0), 0.0)
            best_i = np.full((nq, 0), 0, np.int64)
            for ref in self.blocks:
                t = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
                if t.num_rows == 0:  # sort can emit empty blocks
                    continue
                cids = np.asarray(t[id_col].to_pylist(), np.int64)
                cmat = _unit(vecs_to_matrix(t[vec_col]))
                sims = qmat @ cmat.T  # (nq, nc)
                sims[qids[:, None] == cids[None, :]] = -np.inf  # self
                m = min(kk, sims.shape[1])
                # stable argsort: ties keep column order = id ascending
                top = np.argsort(-sims, axis=1, kind="stable")[:, :m]
                rows = np.arange(nq)[:, None]
                cand_s = np.concatenate([best_s, sims[rows, top]], axis=1)
                cand_i = np.concatenate(
                    [best_i, cids[top]], axis=1
                )
                # previous best ids are all smaller than this block's ids,
                # so stable sort again resolves ties id-ascending
                order = np.argsort(-cand_s, axis=1, kind="stable")[:, :kk]
                best_s = cand_s[rows, order]
                best_i = cand_i[rows, order]
            m = best_s.shape[1]
            keep = np.isfinite(best_s)
            qid_out = np.repeat(qids, m)[keep.ravel()]
            nbr_out = best_i.ravel()[keep.ravel()]
            sc_out = np.round(best_s.ravel()[keep.ravel()], 4)
            return pa.table(
                {
                    "qid": pa.array(qid_out, pa.int64()),
                    "nbr": pa.array(nbr_out, pa.int64()),
                    "score": pa.array(sc_out, pa.float64()),
                }
            )

    return ds.map_batches(Scorer, batch_format="pyarrow",
                          concurrency=(1, 8))


def knn_graph_ivf(
    ds,
    centroid_mat: np.ndarray,
    k: int = 2,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 2,
):
    """IVF-bucketed approximate kNN GRAPH -- the self-join SCALE PATH for
    :func:`knn_graph` (whose blocked GEMM is exact but O(n^2) compute).
    Every vector joins its own cell as a member and probes its ``nprobe``
    nearest cells as a query; candidates are cell-mates only, so compute
    drops from n^2 to ~n^2*nprobe/C for C balanced cells.

    Cell assignment is the integer-quantized L2 argmin of
    :func:`ivf_topk` (bit-identical across numpy and the SQL oracle).
    Two bucketed exchanges, no broadcast of the corpus:

    1. shuffle on the CELL id -- member rows ship once, query rows
       ``nprobe`` times (volume O(n * (1+nprobe) * d)); each cell's task
       runs one queries x members GEMM and emits per-query partial top-k
       (members pre-sorted by id so stable argsort keeps id-asc ties);
    2. shuffle on the QUERY id merges partials to the final top-k
       (rounded-score desc, id asc -- the ann-family merge convention).

    Recall vs the exact graph is fixture-tested (tests/test_ops.py); the
    oracle replays assignment + probing + rerank in full.
    """
    import ray

    cq = _quantize(np.asarray(centroid_mat, np.float64))  # (C, d)
    cref = ray.put(cq)

    def emit(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        ids = np.asarray(batch[id_col].to_pylist(), np.int64)
        raw = vecs_to_matrix(batch[vec_col])
        d2 = ((_quantize(raw)[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        # members: own cell (argmin -> lowest cid on ties)
        own = np.argmin(d2, axis=1).astype(np.int64)
        # queries: nprobe nearest cells, ties -> lower cid
        order = np.lexsort(
            (np.tile(np.arange(c.shape[0]), (len(ids), 1)), d2)
        )[:, :nprobe]
        out_ids = np.concatenate([ids, np.repeat(ids, nprobe)])
        out_cell = np.concatenate([own, order.ravel()])
        kind = np.concatenate(
            [np.zeros(len(ids), np.int8), np.ones(len(ids) * nprobe, np.int8)]
        )
        vecs = batch[vec_col]
        if isinstance(vecs, pa.ChunkedArray):
            vecs = vecs.combine_chunks()
        take = pa.array(
            np.concatenate(
                [np.arange(len(ids)), np.repeat(np.arange(len(ids)), nprobe)]
            ),
            pa.int64(),
        )
        return pa.table(
            {
                "id": pa.array(out_ids, pa.int64()),
                "cell": pa.array(out_cell, pa.int64()),
                "kind": pa.array(kind),
                "vec": vecs.take(take),
            }
        )

    def cell_topk(group: pa.Table) -> pa.Table:
        kind = group["kind"].to_numpy(zero_copy_only=False)
        ids = group["id"].to_numpy(zero_copy_only=False)
        vecs = vecs_to_matrix(group["vec"])
        msel = kind == 0
        qsel = ~msel
        if not msel.any() or not qsel.any():
            return pa.table(
                {"qid": pa.array([], pa.int64()),
                 "vec_id": pa.array([], pa.int64()),
                 "score": pa.array([], pa.float64())}
            )
        mids, mvecs = ids[msel], vecs[msel]
        o = np.argsort(mids, kind="stable")  # id-asc tie discipline
        mids, mvecs = mids[o], mvecs[o]
        qids, qvecs = ids[qsel], vecs[qsel]
        sims = _unit(qvecs) @ _unit(mvecs).T
        sims[qids[:, None] == mids[None, :]] = -np.inf  # self
        m = min(k, sims.shape[1])
        top = np.argsort(-sims, axis=1, kind="stable")[:, :m]
        rows = np.arange(len(qids))[:, None]
        sc = sims[rows, top].ravel()
        keep = np.isfinite(sc)
        return pa.table(
            {
                "qid": pa.array(np.repeat(qids, m)[keep], pa.int64()),
                "vec_id": pa.array(mids[top].ravel()[keep], pa.int64()),
                "score": pa.array(np.round(sc[keep], 4), pa.float64()),
            }
        )

    partial = (
        ds.map_batches(emit, batch_format="pyarrow")
        .groupby("cell")
        .map_groups(cell_topk, batch_format="pyarrow")
    )

    def merge(group: pa.Table) -> pa.Table:
        # candidates can arrive via several probed cells -> dedup first
        t = group.group_by(
            ["qid", "vec_id"], use_threads=False
        ).aggregate([("score", "max")]).rename_columns(
            ["qid", "vec_id", "score"]
        )
        t = t.sort_by([("score", "descending"), ("vec_id", "ascending")])
        return t.slice(0, k)

    return partial.groupby("qid").map_groups(merge, batch_format="pyarrow")


def semdedup(
    ds,
    *,
    n_clusters: int = 8,
    iterations: int = 3,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster: int = 100_000,
):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540 -- public): semantic
    deduplication by k-means clustering + WITHIN-cluster cosine pruning.
    Generalizes the reference's exact-dup suppression (oai.rb's delete/
    insert cycle keeps one record per id) to "keep one document per
    semantic neighborhood".

    Deterministic, SQL-replayable semantics: cluster with the
    integer-exact Lloyd k-means (``kmeans_quantized``); within a cluster a
    row is DROPPED iff some row with a SMALLER id in the same cluster has
    cosine similarity >= ``threshold`` (greedy first-occurrence keep --
    the same keep rule as exact dedup / paragraph dedup).  Returns the
    kept rows as a Dataset (id_col, cluster:int32).

    Scale shape -- the whole point of SemDeDup: the corpus is never
    all-pairs.  Pairwise cosine happens only WITHIN a cluster, and
    ``n_clusters`` scales with n (the paper runs 50k clusters over LAION
    so each cluster is ~n/C rows).  Centroids are O(C*d) broadcast state;
    assignment is one stateless ``map_batches`` pass; ONE coarse hash
    shuffle (grouped_apply) co-locates each cluster; a cluster larger
    than ``max_cluster`` logs a warning (observe-only guard, ops/windows
    pattern) -- the production fix is more clusters, not a bigger task.
    """
    import ray

    cents, _ = kmeans_quantized(
        ds,
        n_clusters=n_clusters,
        iterations=iterations,
        id_col=id_col,
        vec_col=vec_col,
    )
    cents_ref = ray.put(cents)

    def assign_with_vec(b: pa.Table) -> pa.Table:
        q = ray.get(cents_ref)
        mat = vecs_to_matrix(b[vec_col])
        vq = _quantize(mat)
        d2 = ((vq[:, None, :] - q[None, :, :]) ** 2).sum(axis=2)
        cid = np.argmin(d2, axis=1)  # first occurrence = lowest cluster id
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        unit = mat / norms[:, None]
        return pa.table(
            {
                id_col: b[id_col],
                "cluster": pa.array(cid.astype(np.int32)),
                "unit": pa.array(list(unit), pa.list_(pa.float64())),
            }
        )

    def prune(group: pa.Table) -> pa.Table:
        t = group.sort_by([(id_col, "ascending")])
        n = len(t)
        if n > max_cluster:
            from .dedup import _log_capped

            _log_capped(
                "semdedup", int(t["cluster"][0].as_py()), n, max_cluster
            )
        mat = np.array(t["unit"].to_pylist(), dtype=np.float64)
        sims = mat @ mat.T
        # dropped[i] = any earlier-id row in the cluster with sim >= thr
        dup = np.tril(sims >= threshold, k=-1).any(axis=1)
        kept = t.filter(pa.array(~dup))
        return kept.select([id_col, "cluster"])

    from .dedup import grouped_apply

    id_type = dict(zip(ds.schema().names, ds.schema().types))[id_col]
    out_schema = pa.schema([(id_col, id_type), ("cluster", pa.int32())])
    return grouped_apply(
        ds.map_batches(assign_with_vec, batch_format="pyarrow"),
        "cluster",
        prune,
        out_schema,
        min_group=1,
    )


def sq8_topk(
    ds,
    query_ids: list[int],
    query_mat: np.ndarray,
    *,
    k: int = 10,
    oversample: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Scalar-quantized (SQ8, faiss-style) top-k with exact rescore: the
    candidate scan ranks by INTEGER dot product of int8-quantized vectors
    (``floor(x*127+0.5)`` -- exact for unit-normalized inputs, |x|<=1),
    keeps the top ``k*oversample`` candidates per query (ties -> lower
    id), then re-scores only those with exact float64 cosine and returns
    the top ``k``.

    Scale shape: this is the memory-footprint path -- the scanned
    representation is 4x smaller than float32 (16x vs the float64 score
    path), which at 100 TB is the difference between an in-object-store
    scan and a spilled one.  Per-batch integer top-m partials are
    associative, so the exchange carries k*oversample rows per query per
    batch; the rescore needs no join because each batch scores its own
    candidates' floats in place.  Every step is integer or replayed
    float64, so the DuckDB oracle reproduces candidate selection AND
    final ranking bit-for-bit."""
    import ray

    m = k * oversample
    qmat = np.asarray(query_mat, dtype=np.float64)
    ref = ray.put({"qid": list(query_ids), "mat": qmat})

    class Scorer:
        def __init__(self):
            q = ray.get(ref)
            self.qids = np.asarray(q["qid"])
            mat = np.asarray(q["mat"], dtype=np.float64)
            self.q8 = np.floor(mat * 127.0 + 0.5).astype(np.int64).T
            self.qunit = _unit(mat).T  # (d, nq)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch[id_col].to_pylist())
            mat = vecs_to_matrix(batch[vec_col])
            d8 = np.floor(mat * 127.0 + 0.5).astype(np.int64)
            idots = d8 @ self.q8  # (n, nq) exact int64
            sims = _unit(mat) @ self.qunit
            mm = min(m, len(ids))
            out_q, out_id, out_i, out_s = [], [], [], []
            for c in range(idots.shape[1]):
                order = np.lexsort((ids, -idots[:, c]))[:mm]
                out_q.extend([self.qids[c]] * len(order))
                out_id.extend(ids[order])
                out_i.extend(idots[order, c])
                out_s.extend(np.round(sims[order, c], 4))
            return pa.table(
                {
                    "qid": pa.array(out_q, pa.int64()),
                    id_col: pa.array(out_id, pa.int64()),
                    "idot": pa.array(out_i, pa.int64()),
                    "score": pa.array(out_s, pa.float64()),
                }
            )

    partial = ds.map_batches(Scorer, concurrency=(1, 8), batch_format="pyarrow")

    def merge(group: pa.Table) -> pa.Table:
        cand = group.sort_by(
            [("idot", "descending"), (id_col, "ascending")]
        ).slice(0, m)
        top = cand.sort_by(
            [("score", "descending"), (id_col, "ascending")]
        ).slice(0, k)
        return top.select(["qid", id_col, "score"])

    return partial.groupby("qid").map_groups(merge, batch_format="pyarrow")


def _int_vecs(col) -> np.ndarray:
    """Columnar ``list<int64>`` -> ``(n, d)`` int64, zero-copy flatten."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    d = int(pc.list_value_length(col)[0].as_py()) if n else 0
    flat = pc.list_flatten(col)
    return (
        flat.to_numpy(zero_copy_only=False)
        .astype(np.int64, copy=False)
        .reshape(n, d)
    )


def mmr_select(
    ds,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    query_id: int = 0,
):
    """Greedy Maximal-Marginal-Relevance selection (Carbonell &
    Goldstein 1998) -- the diverse-subset curation cut over an embedding
    table: step 1 picks the most query-relevant vector, each later step
    picks ``argmax(rel(i) - max_{s in S} sim(i, s))`` (lambda = 1/2,
    scores doubled so the trade-off is all-integer).  Relevance and
    similarity are integer dot products of 2^20-quantized vectors, ties
    break to the lowest id -- every step is exactly replayable in SQL.
    Emits ``(vec_id, step, score_units)``.

    Scale shape: vectors quantize ONCE into a materialized slim
    (id, int64-vector) dataset; each of the k greedy steps is one
    map_batches pass -- a (batch x dim) @ (dim x |S|) integer GEMM
    against the BROADCAST selected matrix (|S| < k rows, shipped via
    the closure) emitting ONE best-candidate row per batch -- plus an
    O(#blocks) driver reduction.  Driver state is the k selected
    vectors, never the corpus; k passes stream the same object-store
    blocks (no re-read, no re-quantize).
    """
    import ray  # noqa: F401
    import ray.data as rd

    def quant(b: pa.Table) -> pa.Table:
        v = _quantize(vecs_to_matrix(b[vec_col]))
        n, d = v.shape
        return pa.table(
            {
                "id": pc.cast(b[id_col], pa.int64()),
                "v": pa.FixedSizeListArray.from_arrays(
                    pa.array(v.ravel(), pa.int64()), d
                ).cast(pa.list_(pa.int64())),
            }
        )

    Q = ds.map_batches(quant, batch_format="pyarrow").materialize()

    qrow = Q.filter(expr=f"id == {query_id}").take(1)
    if not qrow:
        raise ValueError(f"mmr_select: query id {query_id} not found")
    qvec = np.asarray(qrow[0]["v"], dtype=np.int64)

    sel_ids: list[int] = []
    sel_vecs: list[np.ndarray] = []
    out_steps: list[tuple[int, int, int]] = []

    n_total = Q.count()
    for step in range(1, min(k, n_total) + 1):
        sel_mat = np.stack(sel_vecs) if sel_vecs else None
        sel_set = np.array(sel_ids, dtype=np.int64)

        def best_in_batch(b: pa.Table, _sm=sel_mat, _ss=sel_set) -> pa.Table:
            ids = b["id"].to_numpy(zero_copy_only=False)
            V = _int_vecs(b["v"])
            score = V @ qvec
            if _sm is not None:
                score = score - (V @ _sm.T).max(axis=1)
            if len(_ss):
                keep = ~np.isin(ids, _ss)
                ids, score, V = ids[keep], score[keep], V[keep]
            if not len(ids):
                return pa.table(
                    {"id": pa.array([], pa.int64()),
                     "score": pa.array([], pa.int64()),
                     "v": pa.array([], pa.list_(pa.int64()))}
                )
            i = np.lexsort((ids, -score))[0]
            return pa.table(
                {
                    "id": pa.array([int(ids[i])], pa.int64()),
                    "score": pa.array([int(score[i])], pa.int64()),
                    "v": pa.array([V[i].tolist()], pa.list_(pa.int64())),
                }
            )

        cand = Q.map_batches(best_in_batch, batch_format="pyarrow").take_all()
        best = min(cand, key=lambda r: (-r["score"], r["id"]))
        sel_ids.append(int(best["id"]))
        sel_vecs.append(np.asarray(best["v"], dtype=np.int64))
        out_steps.append((int(best["id"]), step, int(best["score"])))

    return rd.from_arrow(pa.table(
        {
            "vec_id": pa.array([t[0] for t in out_steps], pa.int64()),
            "step": pa.array([t[1] for t in out_steps], pa.int64()),
            "score_units": pa.array([t[2] for t in out_steps], pa.int64()),
        }
    ))


def dim_stats(ds, *, vec_col: str = "embedding"):
    """Per-dimension mean/variance of an embedding column -- the tensor
    analog of ``grouped_moments``, the normalization-statistics pass a
    feature pipeline runs before whitening.

    Scale shape: each batch collapses to ONE (dim, n, sum, sumsq) partial
    row per dimension (columnar ``V.sum(axis=0)`` over the 2^20-quantized
    matrix -- d rows per batch regardless of batch size), one tiny
    groupby-sum merges them, and the IEEE finish replays the oracle's
    exact operand order so the float bits hash equal.  Overflow bound
    (documented): per-dim sumsq < 2^63 -- unit-norm embeddings
    (|x| <= 1 -> x_q^2 <= 2^40) allow ~8e6 rows per dim per PARTIAL and
    the groupby-sum of partials shares the bound; rescale for wider
    domains.  ``dim`` is 1-based to match SQL list indexing.
    """
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        V = _quantize(vecs_to_matrix(b[vec_col]))
        n, d = V.shape
        return pa.table(
            {
                "dim": pa.array(np.arange(1, d + 1, dtype=np.int64)),
                "s": pa.array(V.sum(axis=0, dtype=np.int64), pa.int64()),
                "ss": pa.array(
                    (V * V).sum(axis=0, dtype=np.int64), pa.int64()
                ),
                "n": pa.array(np.full(d, n, np.int64), pa.int64()),
            }
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("dim")
        .aggregate(
            Sum("s", alias_name="s"),
            Sum("ss", alias_name="ss"),
            Sum("n", alias_name="n"),
        )
    )

    def finish(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = b["s"].to_numpy(zero_copy_only=False).astype(np.float64)
        ss = b["ss"].to_numpy(zero_copy_only=False).astype(np.float64)
        qf = float(_QUANT)
        mean = (s / n) / qf
        with np.errstate(invalid="ignore", divide="ignore"):
            var = ((ss - s * s / n) / (n - 1.0)) / (qf * qf)
        var = np.where(n > 1, var, np.nan)
        return pa.table(
            {
                "dim": b["dim"],
                "n_rows": pc.cast(b["n"], pa.int64()),
                "mean_v": pa.array(mean, pa.float64()),
                "var_v": pa.array(var, pa.float64()),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


def embedding_gram(ds, *, vec_col: str = "embedding",
                   scale: float = 1_000_000.0):
    """Exact integer Gram (second-moment) matrix of an embedding column:
    ``G[i, j] = sum_rows v_i * v_j`` over coordinates quantized to
    ``scale`` micro-units with SQL ROUND tie semantics -- the
    distributed statistics pass that feeds PCA / whitening / covariance
    estimation without ever centralizing a single vector.

    Each batch computes its whole ``M.T @ M`` contribution as ONE int64
    matmul (object arithmetic never overflows silently: numpy int64
    matmul wraps, so entries are checked against the theoretical bound
    and the op fails loudly if ``scale`` is too hot for the data); the
    exchange then carries only d*(d+1)/2 upper-triangle rows per batch
    into a tiny groupby-sum.  Returns rows (i, j, g) with i <= j,
    int64.

    Overflow contract: |v| <= Vmax quantized gives per-pair products
    <= (scale*Vmax)^2; with n rows the sum is bounded by
    n*(scale*Vmax)^2, which must stay under 2^63.  At web scale drop
    ``scale`` to 1e3 (milli-units) -- the check recomputes the bound
    from the observed max magnitude per batch either way.
    """
    from ray.data.aggregate import Sum

    from ..functions.numeric import sql_round_i64

    def partial(b: pa.Table) -> pa.Table:
        mat = vecs_to_matrix(b[vec_col])
        n, d = mat.shape
        if n == 0:
            return pa.table(
                {"i": pa.array([], pa.int64()),
                 "j": pa.array([], pa.int64()),
                 "g": pa.array([], pa.int64())}
            )
        flat = pa.array(mat.reshape(-1), pa.float64())
        q = sql_round_i64(flat, scale).to_numpy().reshape(n, d)
        vmax = int(np.abs(q).max())
        # n * vmax^2 bounds every |G| entry of this batch's contribution
        if vmax and n > (2**62) // (vmax * vmax):
            raise OverflowError(
                f"embedding_gram: batch of {n} rows with max |v|={vmax} "
                f"micro-units can overflow int64; lower scale={scale}"
            )
        g = q.T @ q
        iu, ju = np.triu_indices(d)
        return pa.table(
            {
                "i": pa.array(iu.astype(np.int64), pa.int64()),
                "j": pa.array(ju.astype(np.int64), pa.int64()),
                "g": pa.array(g[iu, ju], pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["i", "j"])
        .aggregate(Sum("g", alias_name="g"))
    )


def pq_topk(
    ds,
    query_ids: list[int],
    query_mat: np.ndarray,
    *,
    k: int = 10,
    n_sub: int = 2,
    ksub: int = 8,
    iterations: int = 2,
    oversample: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Product-quantization (PQ, Jegou et al. 2011) top-k with exact
    rescore: the vector splits into ``n_sub`` subspaces, each trained to
    a ``ksub``-centroid codebook by the SAME deterministic integer Lloyd
    recurrence as :func:`kmeans_quantized`; the candidate scan ranks by
    the ADC integer distance (per-query lookup table of subspace
    centroid distances, summed over each vector's codes -- ties -> lower
    id), keeps the top ``k*oversample`` per query, then rescores those
    with exact float64 cosine (rounded to 4 decimals, the sq8_topk
    contract) and returns the top ``k``.

    Scale shape: this is the compression path past SQ8 -- the scanned
    representation is ``n_sub`` SMALL INTS per vector (codebooks are
    O(n_sub*ksub*dsub) driver state broadcast once), so a 100-TB float
    corpus scans as a few TB of codes; training is the kmeans combiner
    (one partial pass per round per subspace), encoding + ADC are one
    stateless integer pass, and the exchange carries k*oversample rows
    per query per batch.  Every candidate step is integer arithmetic, so
    the DuckDB oracle (two suffixed _kmeans_ctes chains + LUT replay)
    reproduces candidate selection AND final ranking bit-for-bit."""
    import ray

    qmat = np.asarray(query_mat, dtype=np.float64)
    dim = qmat.shape[1]
    if dim % n_sub:
        raise ValueError(f"dim {dim} not divisible by n_sub {n_sub}")
    dsub = dim // n_sub
    m = k * oversample

    def sub_ds(s: int):
        lo = s * dsub

        def slice_batch(b: pa.Table, _lo=lo) -> pa.Table:
            mat = vecs_to_matrix(b[vec_col])[:, _lo:_lo + dsub]
            n = len(b)
            flat = pa.array(np.ascontiguousarray(mat).ravel(), pa.float64())
            col = pa.ListArray.from_arrays(
                pa.array(np.arange(n + 1) * dsub, pa.int32()), flat
            )
            return pa.table({id_col: b[id_col], vec_col: col})

        return ds.map_batches(slice_batch, batch_format="pyarrow")

    books = []
    for s in range(n_sub):
        # materialize the subspace slice ONCE: Lloyd consumes it
        # iterations+2 times (init scan, per-round partials, assign) and
        # an unmaterialized slice re-executes the parquet read + slicing
        # per consumer (the embeddings_semdedup lesson, NOTES r4).  The
        # slice is n x dsub -- at true 100-TB scale the training pass
        # runs on a sample, so this stays bounded.
        cents, _ = kmeans_quantized(
            sub_ds(s).materialize(), n_clusters=ksub,
            iterations=iterations, id_col=id_col, vec_col=vec_col,
        )
        books.append(cents)  # (ksub, dsub) int64

    ref = ray.put(
        {"qid": list(query_ids), "mat": qmat, "books": books}
    )

    class Scorer:
        def __init__(self):
            q = ray.get(ref)
            self.qids = np.asarray(q["qid"])
            mat = np.asarray(q["mat"], np.float64)
            self.books = q["books"]
            self.qunit = _unit(mat).T  # (d, nq)
            # per-query ADC lookup tables: (n_sub, nq, ksub) int64
            self.lut = np.stack(
                [
                    (
                        (
                            _quantize(mat[:, s * dsub:(s + 1) * dsub])
                            [:, None, :]
                            - self.books[s][None, :, :]
                        ) ** 2
                    ).sum(axis=2)
                    for s in range(n_sub)
                ]
            )

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch[id_col].to_pylist())
            mat = vecs_to_matrix(batch[vec_col])
            nq = len(self.qids)
            adc = np.zeros((len(ids), nq), np.int64)
            for s in range(n_sub):
                vq = _quantize(mat[:, s * dsub:(s + 1) * dsub])
                d2 = ((vq[:, None, :] - self.books[s][None, :, :]) ** 2
                      ).sum(axis=2)
                codes = np.argmin(d2, axis=1)  # ties -> lowest cid
                adc += self.lut[s][:, codes].T
            sims = _unit(mat) @ self.qunit
            mm = min(m, len(ids))
            out_q, out_id, out_a, out_s = [], [], [], []
            for c in range(nq):
                order = np.lexsort((ids, adc[:, c]))[:mm]
                out_q.extend([self.qids[c]] * len(order))
                out_id.extend(ids[order])
                out_a.extend(adc[order, c])
                out_s.extend(np.round(sims[order, c], 4))
            return pa.table(
                {
                    "qid": pa.array(out_q, pa.int64()),
                    id_col: pa.array(out_id, pa.int64()),
                    "adc": pa.array(out_a, pa.int64()),
                    "score": pa.array(out_s, pa.float64()),
                }
            )

    partial = ds.map_batches(
        Scorer, concurrency=(1, 8), batch_format="pyarrow"
    )

    def merge(group: pa.Table) -> pa.Table:
        cand = group.sort_by(
            [("adc", "ascending"), (id_col, "ascending")]
        ).slice(0, m)
        top = cand.sort_by(
            [("score", "descending"), (id_col, "ascending")]
        ).slice(0, k)
        return top.select(["qid", id_col, "score"])

    return partial.groupby("qid").map_groups(merge, batch_format="pyarrow")


def power_iteration_top_component(ds, *, vec_col: str = "embedding",
                                  iterations: int = 4,
                                  scale: float = 1_000_000.0,
                                  comp_scale: int = 1_000_000):
    """Top principal direction of the (uncentered) second-moment matrix
    by integer-exact power iteration -- the PCA primitive on top of
    :func:`embedding_gram`.

    The heavy pass is fully distributed (the Gram matmul partials);
    what reaches the driver is the d*(d+1)/2-entry Gram table (d = 64
    -> 2080 rows, O(d^2) driver state by design), and the iteration
    itself is d x d arithmetic done in PYTHON BIG INTS so no overflow
    and no float summation order can creep in:

        w   = G @ x              (exact integer matvec)
        x'  = trunc(w * comp_scale / max|w|)   (per-entry, trunc like
                                                SQL's HUGEINT //)

    starting from the all-ones vector (x = comp_scale).  Every step is
    order-independent integer arithmetic, so the DuckDB oracle replays
    it bit-for-bit with HUGEINT sums and the same truncating divide
    (entry_queries.embeddings_pca_power unrolls the iterations).

    Returns a pa.Table (i, component_units) -- the unnormalized top
    eigenvector direction in ``comp_scale`` units (sign follows the
    all-ones start; callers wanting unit norm divide off-line).
    """
    import ray  # noqa: F401

    gram = embedding_gram(ds, vec_col=vec_col, scale=scale)
    rows = gram.take_all()
    if not rows:
        return pa.table(
            {"i": pa.array([], pa.int64()),
             "component_units": pa.array([], pa.int64())}
        )
    d = max(r["j"] for r in rows) + 1
    G = [[0] * d for _ in range(d)]
    for r in rows:
        G[r["i"]][r["j"]] = int(r["g"])
        G[r["j"]][r["i"]] = int(r["g"])

    x = [int(comp_scale)] * d
    for _ in range(iterations):
        w = [sum(G[i][j] * x[j] for j in range(d)) for i in range(d)]
        m = max(abs(v) for v in w)
        if m == 0:
            break
        x = [
            (-((-v) * comp_scale // m)) if v < 0
            else (v * comp_scale // m)
            for v in w
        ]
    return pa.table(
        {
            "i": pa.array(np.arange(d), pa.int64()),
            "component_units": pa.array(x, pa.int64()),
        }
    )


def hard_negatives_topk(
    ds,
    query_ids: list[int],
    query_mat: np.ndarray,
    query_labels: list[int],
    k: int = 5,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
):
    """Contrastive HARD-NEGATIVE mining: for every query, the exact
    cosine top-k among corpus vectors whose ``label_col`` DIFFERS from
    the query's label (and excluding the query row itself) -- the
    batched negative-selection pass of contrastive / triplet training
    data preparation, as a label-masked brute scan.

    Scale shape identical to brute_topk: queries (ids, labels, matrix)
    broadcast once per actor; each batch does ONE GEMM against all
    queries and applies the per-query label mask vectorized before the
    per-batch partial top-k; one tiny per-qid groupby merges partials.
    Scores carry the shared ROUND(cos, 4) + vec_id tie-break so the
    DuckDB oracle replays selection exactly.
    """
    import ray

    ref = ray.put(
        {
            "qid": list(query_ids),
            "mat": np.asarray(query_mat),
            "lab": np.asarray(query_labels, np.int64),
        }
    )

    class Scorer:
        def __init__(self):
            q = ray.get(ref)
            self.qids = np.asarray(q["qid"])
            self.qlab = np.asarray(q["lab"])
            self.qmat = _unit(np.asarray(q["mat"], np.float64)).T

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch[id_col].to_pylist())
            labs = np.asarray(batch[label_col].to_pylist(), np.int64)
            mat = _unit(vecs_to_matrix(batch[vec_col]))
            sims = mat @ self.qmat  # (n, nq)
            out_q, out_id, out_s = [], [], []
            for j, qid in enumerate(self.qids):
                mask = (labs != self.qlab[j]) & (ids != qid)
                if not mask.any():
                    continue
                col = np.where(mask, sims[:, j], -np.inf)
                kk = min(k, int(mask.sum()))
                top = (
                    np.argpartition(-col, kk - 1)[:kk]
                    if kk < len(ids) else np.flatnonzero(mask)
                )
                for i in top:
                    if not mask[i]:
                        continue
                    out_q.append(int(qid))
                    out_id.append(int(ids[i]))
                    out_s.append(round(float(sims[i, j]), 4))
            return pa.table(
                {
                    "qid": pa.array(out_q, pa.int64()),
                    "vec_id": pa.array(out_id, pa.int64()),
                    "score": pa.array(out_s, pa.float64()),
                }
            )

    partial = ds.map_batches(Scorer, batch_format="pyarrow", concurrency=2)

    def merge(group: pa.Table) -> pa.Table:
        t = group.sort_by([("score", "descending"), ("vec_id", "ascending")])
        return t.slice(0, k)

    return partial.groupby("qid").map_groups(merge, batch_format="pyarrow")
