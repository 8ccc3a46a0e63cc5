"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Shuffle design (ray_guide 'Aggregation at scale'): every operator
pre-aggregates inside ``map_batches`` (hashes, signatures, partial
(key -> min_id, count) maps) so the groupby shuffle moves signatures and
candidate keys, never document text.  Candidate pairs are verified from
signatures; connected components reuse
stages.canonicalize.connected_components (bounded label propagation).
"""

from __future__ import annotations

import hashlib
import re
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_WORD_RE = re.compile(r"\w+", re.UNICODE)


# -- exact dedup -----------------------------------------------------------

def add_content_hash(batch: pa.Table, col: str = "text") -> pa.Table:
    texts = batch[col].to_pylist()
    h = [hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in texts]
    return batch.append_column("content_hash", pa.array(h, pa.string()))


def exact_dedup_groups(ds, id_col: str = "doc_id", text_col: str = "text"):
    """-> one row per distinct content: (content_hash, doc_id=min id, cnt).

    Two-phase: per-batch partial (hash -> min_id, cnt), then a small
    groupby-aggregate over partials -- the shuffle carries one row per
    distinct hash per batch, not per document."""
    from ray.data.aggregate import Min, Sum

    def partial(batch: pa.Table) -> pa.Table:
        b = add_content_hash(batch, text_col)
        g = (
            b.select(["content_hash", id_col])
            .group_by(["content_hash"], use_threads=False)
            .aggregate([(id_col, "min"), (id_col, "count")])
        )
        return g.rename_columns(["content_hash", "min_id", "cnt"])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    out = partials.groupby("content_hash").aggregate(
        Min("min_id", alias_name=id_col), Sum("cnt", alias_name="cnt")
    )
    return out


def exact_dedup(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Keep exactly one representative (min id) per distinct text."""
    groups = exact_dedup_groups(ds, id_col, text_col)
    keep = groups.map_batches(
        lambda b: b.select([id_col]), batch_format="pyarrow"
    )
    return keep


# -- shingles & signatures -------------------------------------------------

def word_ngrams(text: str, n: int = 3) -> set[str]:
    toks = _WORD_RE.findall((text or "").lower())
    if len(toks) < n:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _shingle_hashes(text: str, n: int) -> np.ndarray:
    sh = word_ngrams(text, n)
    if not sh:
        return np.array([0], np.uint64)
    return np.array(
        [zlib.crc32(s.encode()) for s in sorted(sh)], np.uint64
    )


class MinHasher:
    """Seeded multiply-shift MinHash: h_i(x) = (a_i * x + b_i) mod 2^64 with
    odd a_i drawn over the full 64-bit range (uint64 overflow IS the mod --
    well-mixed, unlike a barely-wrapping Mersenne-prime scheme)."""

    def __init__(self, num_perm: int = 64, seed: int = 42, ngram: int = 3):
        rng = np.random.RandomState(seed)

        def draw64(n):
            hi = rng.randint(0, 1 << 32, n).astype(np.uint64)
            lo = rng.randint(0, 1 << 32, n).astype(np.uint64)
            return (hi << np.uint64(32)) | lo

        self.a = draw64(num_perm) | np.uint64(1)  # odd multipliers
        self.b = draw64(num_perm)
        self.num_perm = num_perm
        self.ngram = ngram

    def signature(self, text: str) -> np.ndarray:
        x = _shingle_hashes(text, self.ngram)
        with np.errstate(over="ignore"):
            # (num_perm, n_shingles); uint64 wraparound is intentional
            vals = self.a[:, None] * x[None, :] + self.b[:, None]
        return vals.min(axis=1).astype(np.uint64)


def minhash_lsh_pairs(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    seed: int = 42,
    ngram: int = 3,
):
    """MinHash+LSH near-dup candidate pairs verified from signatures.

    pipeline: signature per doc (map_batches) -> explode to
    (band, band_hash, id, signature) rows -> groupby band bucket ->
    pairwise estimated Jaccard within bucket -> threshold filter -> dedup.
    Returns ds of (a, b, est_jaccard), a < b.
    """
    rows_per_band = num_perm // bands
    hasher = MinHasher(num_perm, seed, ngram)

    def sig_and_bands(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        out_band, out_hash, out_id, out_sig = [], [], [], []
        for i, t in zip(ids, texts):
            sig = hasher.signature(t)
            sig_bytes = sig.tobytes()
            for b in range(bands):
                band = sig[b * rows_per_band : (b + 1) * rows_per_band]
                out_band.append(b)
                out_hash.append(
                    zlib.crc32(band.tobytes()) & 0x7FFFFFFF
                )
                out_id.append(i)
                out_sig.append(sig_bytes)
        return pa.table(
            {
                "band": pa.array(out_band, pa.int32()),
                "band_hash": pa.array(out_hash, pa.int64()),
                "id": pa.array(out_id),
                "sig": pa.array(out_sig, pa.binary()),
            }
        )

    exploded = ds.map_batches(sig_and_bands, batch_format="pyarrow")

    def bucket_key(batch: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            pc.cast(batch["band"], pa.string()),
            pc.cast(batch["band_hash"], pa.string()),
            ":",
        )
        return batch.append_column("bucket", key)

    def pairs_in_bucket(group: pa.Table) -> pa.Table:
        ids = group["id"].to_pylist()
        sigs = group["sig"].to_pylist()
        uniq: dict = {}
        for i, s in zip(ids, sigs):
            uniq[i] = s
        items = sorted(uniq.items())
        a_out, b_out, j_out = [], [], []
        # bucket sizes are tiny by construction; cap pathological buckets
        items = items[:200]
        for x in range(len(items)):
            sx = np.frombuffer(items[x][1], np.uint64)
            for y in range(x + 1, len(items)):
                sy = np.frombuffer(items[y][1], np.uint64)
                est = float((sx == sy).mean())
                if est >= threshold:
                    a_out.append(items[x][0])
                    b_out.append(items[y][0])
                    j_out.append(round(est, 6))
        return pa.table(
            {
                "a": pa.array(a_out),
                "b": pa.array(b_out),
                "est_jaccard": pa.array(j_out, pa.float64()),
            }
        )

    candidates = (
        exploded.map_batches(bucket_key, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs_in_bucket, batch_format="pyarrow")
    )
    # same pair can surface from multiple bands -> dedup on (a, b)
    from ..stages.canonicalize import local_dedup

    def key(batch: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            pc.cast(batch["a"], pa.string()), pc.cast(batch["b"], pa.string()), "|"
        )
        return local_dedup(batch.append_column("pk", k), ["pk"])

    out = candidates.map_batches(key, batch_format="pyarrow")
    out = out.groupby("pk").map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow"
    )
    return out.drop_columns(["pk"])


# -- SimHash ---------------------------------------------------------------

def simhash64(text: str) -> int:
    """64-bit SimHash over word features (crc-seeded, deterministic)."""
    acc = np.zeros(64, np.int64)
    for tok in _WORD_RE.findall((text or "").lower()):
        h = int.from_bytes(
            hashlib.blake2b(tok.encode(), digest_size=8).digest(), "big"
        )
        bits = np.array([(h >> i) & 1 for i in range(64)], np.int64)
        acc += bits * 2 - 1
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def simhash_batch(batch: pa.Table, id_col="doc_id", text_col="text") -> pa.Table:
    texts = batch[text_col].to_pylist()
    hs = [simhash64(t) for t in texts]
    # 4 x 16-bit chunks for hamming<=3 banding
    return pa.table(
        {
            id_col: batch[id_col],
            "simhash": pa.array([h - (1 << 63) for h in hs], pa.int64()),
            "chunk0": pa.array([h & 0xFFFF for h in hs], pa.int32()),
            "chunk1": pa.array([(h >> 16) & 0xFFFF for h in hs], pa.int32()),
            "chunk2": pa.array([(h >> 32) & 0xFFFF for h in hs], pa.int32()),
            "chunk3": pa.array([(h >> 48) & 0xFFFF for h in hs], pa.int32()),
        }
    )


def simhash_pairs(ds, *, id_col="doc_id", text_col="text", max_hamming: int = 3):
    """Near-dup pairs by SimHash: band on each 16-bit chunk (pigeonhole: any
    pair within hamming<=3 shares at least one of 4 chunks), verify hamming."""
    sigs = ds.map_batches(
        lambda b: simhash_batch(b, id_col, text_col), batch_format="pyarrow"
    )

    def explode(batch: pa.Table) -> pa.Table:
        n = len(batch)
        tabs = []
        for c in range(4):
            key = pc.binary_join_element_wise(
                pa.array([str(c)] * n),
                pc.cast(batch[f"chunk{c}"], pa.string()),
                ":",
            )
            tabs.append(
                pa.table(
                    {
                        "bucket": key,
                        "id": batch[id_col],
                        "simhash": batch["simhash"],
                    }
                )
            )
        return pa.concat_tables(tabs)

    def pairs(group: pa.Table) -> pa.Table:
        items = sorted(set(zip(group["id"].to_pylist(),
                               group["simhash"].to_pylist())))[:200]
        a_out, b_out, d_out = [], [], []
        for x in range(len(items)):
            for y in range(x + 1, len(items)):
                d = bin((items[x][1] ^ items[y][1]) & ((1 << 64) - 1)).count("1")
                if d <= max_hamming:
                    a_out.append(items[x][0])
                    b_out.append(items[y][0])
                    d_out.append(d)
        return pa.table(
            {"a": pa.array(a_out), "b": pa.array(b_out),
             "hamming": pa.array(d_out, pa.int32())}
        )

    cand = (
        sigs.map_batches(explode, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs, batch_format="pyarrow")
    )

    def key(batch: pa.Table) -> pa.Table:
        from ..stages.canonicalize import local_dedup

        k = pc.binary_join_element_wise(
            pc.cast(batch["a"], pa.string()), pc.cast(batch["b"], pa.string()), "|"
        )
        return local_dedup(batch.append_column("pk", k), ["pk"])

    out = cand.map_batches(key, batch_format="pyarrow")
    out = out.groupby("pk").map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow"
    )
    return out.drop_columns(["pk"])


# -- exact n-gram Jaccard (verification-grade) -----------------------------

def ngram_jaccard(text_a: str, text_b: str, n: int = 3) -> float:
    a, b = word_ngrams(text_a, n), word_ngrams(text_b, n)
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    return len(a & b) / len(a | b)


# -- embedding cosine near-dup --------------------------------------------

def embedding_dup_pairs(
    ds,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    num_planes: int = 12,
    seed: int = 42,
    dim: int | None = None,
):
    """Near-dup pairs by cosine similarity, LSH-bucketed (random signed
    hyperplanes, seeded).  Verification computes exact cosine within bucket.
    Scale path: bucket count 2^num_planes bounds group sizes."""

    state = {"planes": None}

    def bucketize(batch: pa.Table) -> pa.Table:
        mat = np.array(batch[vec_col].to_pylist(), dtype=np.float64)
        if state["planes"] is None:
            d = mat.shape[1] if dim is None else dim
            rng = np.random.RandomState(seed)
            state["planes"] = rng.randn(d, num_planes)
        proj = mat @ state["planes"]
        bits = (proj > 0).astype(np.int64)
        bucket = (bits * (1 << np.arange(num_planes))).sum(axis=1)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        unit = mat / norms[:, None]
        return pa.table(
            {
                "bucket": pa.array(bucket, pa.int64()),
                "id": batch[id_col],
                "unit": pa.array(list(unit), pa.list_(pa.float64())),
            }
        )

    def pairs(group: pa.Table) -> pa.Table:
        ids = group["id"].to_pylist()
        mat = np.array(group["unit"].to_pylist(), dtype=np.float64)
        order = np.argsort(ids)
        ids = [ids[i] for i in order]
        mat = mat[order][:500]
        ids = ids[:500]
        sims = mat @ mat.T
        a_out, b_out, s_out = [], [], []
        n = len(ids)
        iu = np.triu_indices(n, 1)
        for x, y in zip(*iu):
            s = sims[x, y]
            if s >= threshold:
                a_out.append(ids[x])
                b_out.append(ids[y])
                s_out.append(round(float(s), 6))
        return pa.table(
            {"a": pa.array(a_out), "b": pa.array(b_out),
             "cosine": pa.array(s_out, pa.float64())}
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs, batch_format="pyarrow")
    )
