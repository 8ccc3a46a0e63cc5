"""Sketch operators: approximate-distinct (HyperLogLog) registers.

The reference counts distinct subjects exactly (SURVEY.md §2.6 A2 /
tools/isql cleanup counts); at 100 TB an exact count-distinct is an
all-to-all shuffle of every key.  HyperLogLog replaces it with a
fixed-size register array: per-batch partial register maxima combine
associatively, so the shuffle carries at most ``2**p`` rows per block
regardless of input size -- the canonical sketch shape for Ray Data
(map_batches partial -> tiny groupby max).

Hashing is md5-derived (same recipe as ops/dedup.py) so the whole
register computation replays bit-exactly in a DuckDB oracle
(``'0x'||substr(md5(key),1,16)`` -> UBIGINT, rho via integer bit-length
on ``bin()``).  The per-row ``hashlib.md5`` here is the documented
SQL-replayability tradeoff (see docs_sample_deterministic); the scale
path swaps in the columnar hash (functions/hashing) and gives up only
oracle replay, not correctness.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

# bias-correction constant for m = 2**p registers (Flajolet et al. 2007)
_ALPHA = {4: 0.673, 5: 0.697, 6: 0.709}


def _alpha(m: int) -> float:
    return _ALPHA.get(int(np.log2(m)), 0.7213 / (1 + 1.079 / m))


def _reg_rho(hv: np.ndarray, rem_bits: int) -> tuple[np.ndarray, np.ndarray]:
    """(register, rho) from 64-bit hashes: register = top ``64-rem_bits``
    bits; rho = leading zeros of the remaining bits + 1 = rem_bits -
    bit_length(rest) + 1 (bit_length(0) == 0).  A float log2 seeds the bit
    length; one exact integer check in each direction repairs any
    misrounding at power-of-two boundaries."""
    reg = (hv >> np.uint64(rem_bits)).astype(np.int64)
    rest = hv & np.uint64((1 << rem_bits) - 1)
    bl = np.zeros(len(rest), np.int64)
    nz = rest != 0
    x = rest[nz]
    b = np.floor(np.log2(x.astype(np.float64))).astype(np.int64) + 1
    b = np.where(x >> b.astype(np.uint64) != 0, b + 1, b)
    b = np.where(x >> (b - 1).astype(np.uint64) == 0, b - 1, b)
    bl[nz] = b
    return reg, rem_bits - bl + 1


def hll_registers(ds, key_col: str, *, p: int = 10):
    """HyperLogLog register table for the distinct count of ``key_col``.

    Returns a Dataset of (register, max_rho): ``register`` = top ``p``
    bits of the 64-bit md5-derived key hash, ``max_rho`` = max over keys
    of (leading zeros of the remaining ``64-p`` bits) + 1.  Registers no
    key maps to are absent (matches the SQL oracle's GROUP BY).

    One tiny shuffle: each batch emits at most ``2**p`` partial rows
    (register-wise max inside the batch), then a global groupby-max.
    Feed the result to :func:`hll_estimate` for the cardinality.
    """
    rem_bits = 64 - p

    def partial(b: pa.Table) -> pa.Table:
        keys = b[key_col].to_pylist()
        hv = np.fromiter(
            (
                int(hashlib.md5(str(k).encode()).hexdigest()[:16], 16)
                for k in keys
            ),
            np.uint64,
            count=len(keys),
        )
        reg, rho = _reg_rho(hv, rem_bits)
        order = np.lexsort((reg,))
        reg_s, rho_s = reg[order], rho[order]
        brk = np.empty(len(reg_s), bool)
        brk[0:1] = True
        if len(reg_s) > 1:
            brk[1:] = reg_s[1:] != reg_s[:-1]
        starts = np.flatnonzero(brk)
        return pa.table(
            {
                "register": pa.array(reg_s[starts], pa.int64()),
                "max_rho": pa.array(
                    np.maximum.reduceat(rho_s, starts), pa.int64()
                ),
            }
        )

    from ray.data.aggregate import Max

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("register")
        .aggregate(Max("max_rho", alias_name="max_rho"))
    )


def hll_registers_by(ds, group_col: str, key_col: str, *, p: int = 10):
    """Per-GROUP HyperLogLog register table: one (group, register,
    max_rho) row per register a group's keys hit -- approximate distinct
    ``key_col`` PER ``group_col`` in a single fixed-size-per-group
    exchange (the per-segment cardinality shape: distinct users per
    event type, distinct urls per domain...).

    Same md5 hash family and rho arithmetic as :func:`hll_registers`, so
    the whole table replays bit-exactly in SQL.  Each batch emits at most
    ``groups_in_batch * 2**p`` partial rows (in practice far fewer);
    the global combine is one groupby-max on (group, register).  Slice a
    group's rows into :func:`hll_estimate` for its cardinality."""
    from ray.data.aggregate import Max

    rem_bits = 64 - p

    def partial(b: pa.Table) -> pa.Table:
        keys = b[key_col].to_pylist()
        grp = b[group_col].to_pylist()
        hv = np.fromiter(
            (
                int(hashlib.md5(str(k).encode()).hexdigest()[:16], 16)
                for k in keys
            ),
            np.uint64,
            count=len(keys),
        )
        reg, rho = _reg_rho(hv, rem_bits)
        # factorize groups within the batch for a pure-int lexsort
        uniq = sorted(set(grp))
        gidx = {g: i for i, g in enumerate(uniq)}
        gi = np.fromiter((gidx[g] for g in grp), np.int64, count=len(grp))
        order = np.lexsort((reg, gi))
        gi_s, reg_s, rho_s = gi[order], reg[order], rho[order]
        brk = np.empty(len(reg_s), bool)
        brk[0:1] = True
        if len(reg_s) > 1:
            brk[1:] = (reg_s[1:] != reg_s[:-1]) | (gi_s[1:] != gi_s[:-1])
        starts = np.flatnonzero(brk)
        return pa.table(
            {
                group_col: pa.array(
                    [uniq[i] for i in gi_s[starts]],
                    b[group_col].type,
                ),
                "register": pa.array(reg_s[starts], pa.int64()),
                "max_rho": pa.array(
                    np.maximum.reduceat(rho_s, starts), pa.int64()
                ),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([group_col, "register"])
        .aggregate(Max("max_rho", alias_name="max_rho"))
    )


def hll_estimate(registers: pa.Table, *, p: int = 10) -> float:
    """Cardinality estimate from a (register, max_rho) table.

    Standard HLL with small-range (linear counting) correction; absent
    registers count as zero.
    """
    m = 1 << p
    rho = np.zeros(m, np.int64)
    rho[np.asarray(registers["register"])] = np.asarray(registers["max_rho"])
    est = _alpha(m) * m * m / np.sum(np.power(2.0, -rho.astype(np.float64)))
    zeros = int(np.sum(rho == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def _md5_u64(keys, salt: str = "") -> np.ndarray:
    """md5-derived 64-bit hashes of ``keys`` (any values; str()-ed), with an
    optional salt prefix -- the oracle-replayable hash family shared by the
    sketch ops (DuckDB: ``'0x'||substr(md5(salt||key),1,16)`` -> UBIGINT)."""
    return np.fromiter(
        (
            int(hashlib.md5((salt + str(k)).encode()).hexdigest()[:16], 16)
            for k in keys
        ),
        np.uint64,
        count=len(keys),
    )


def cms_counts(ds, key_col: str, probes, *, depth: int = 4, width: int = 1024):
    """Count-min-sketch estimated counts for the ``probes`` keys.

    The sketch is a depth x width counter grid: row ``r`` buckets each key
    by ``md5(str(r) || key) % width``; a key's estimate is the MIN over
    rows of its bucket counter -- an upper bound on the true count with
    bounded memory (depth*width counters) regardless of key cardinality.

    Shuffle-safety: each batch emits at most depth*width partial rows
    ((row, bucket) partial counts combined inside the batch), then one
    tiny groupby-sum -- the input never ships its keys anywhere.  The
    probe lookup is driver-side over the depth*width result (a few KB).

    Returns a pyarrow Table (key: string, cms_count: int64) over the probe
    keys, deterministic and bit-exact vs the SQL oracle.
    """
    def partial(b: pa.Table) -> pa.Table:
        keys = b[key_col].to_pylist()
        rows_out, buckets_out, counts_out = [], [], []
        for r in range(depth):
            hv = _md5_u64(keys, salt=str(r))
            bucket = (hv % np.uint64(width)).astype(np.int64)
            bc = np.bincount(bucket, minlength=width)
            nz = np.flatnonzero(bc)
            rows_out.append(np.full(len(nz), r, np.int64))
            buckets_out.append(nz.astype(np.int64))
            counts_out.append(bc[nz].astype(np.int64))
        return pa.table(
            {
                "row": pa.array(np.concatenate(rows_out), pa.int64()),
                "bucket": pa.array(np.concatenate(buckets_out), pa.int64()),
                "cnt": pa.array(np.concatenate(counts_out), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    grid = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["row", "bucket"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_arrow_refs()
    )
    import ray

    grid = pa.concat_tables([ray.get(r) for r in grid])
    counters = np.zeros((depth, width), np.int64)
    counters[
        np.asarray(grid["row"]), np.asarray(grid["bucket"])
    ] = np.asarray(grid["cnt"])
    probes = [str(p_) for p_ in probes]
    est = np.full(len(probes), np.iinfo(np.int64).max, np.int64)
    for r in range(depth):
        hv = _md5_u64(probes, salt=str(r))
        est = np.minimum(est, counters[r, (hv % np.uint64(width)).astype(np.int64)])
    return pa.table(
        {
            "key": pa.array(probes, pa.string()),
            "cms_count": pa.array(est, pa.int64()),
        }
    )


def bloom_flag(ds, key_col: str, blocked, *, m_bits: int = 1 << 16, k: int = 4):
    """Flag rows whose ``key_col`` hits a Bloom filter built from the
    ``blocked`` keys -- the broadcast-compact pre-filter for distributed
    anti-joins: the filter ships m_bits/8 bytes to every task instead of
    the full blocked-key set, at the cost of deterministic false
    positives (callers verify flagged rows against the exact set).

    Bit positions are md5-derived (``md5(str(j) || key) % m_bits`` for
    j in 0..k-1) so the flagged set -- INCLUDING false positives -- is a
    pure function of (blocked, m_bits, k) and replays bit-exactly in the
    SQL oracle.  Per-row md5 is the documented SQL-replayability tradeoff;
    the scale path swaps in the columnar hash (functions/hashing).

    Returns ``ds`` filtered to flagged rows.
    """
    bits = np.zeros(m_bits, bool)
    blocked = [str(b) for b in blocked]
    for j in range(k):
        hv = _md5_u64(blocked, salt=str(j))
        bits[(hv % np.uint64(m_bits)).astype(np.int64)] = True
    import ray

    bits_ref = ray.put(bits)

    def flag(b: pa.Table) -> pa.Table:
        bt = ray.get(bits_ref)
        keys = b[key_col].to_pylist()
        hit = np.ones(len(keys), bool)
        for j in range(k):
            hv = _md5_u64(keys, salt=str(j))
            hit &= bt[(hv % np.uint64(m_bits)).astype(np.int64)]
        return b.filter(pa.array(hit, pa.bool_()))

    return ds.map_batches(flag, batch_format="pyarrow")


def cms_f2_estimate(ds, key_col: str, *, depth: int = 4, width: int = 1024):
    """Self-equi-join size estimate from the count-min grid: for each of
    the ``depth`` rows, SUM(bucket_count^2) upper-bounds the true join
    size F2 = sum_k c_k^2 (colliding keys only inflate); the estimate is
    the MIN over rows (Alon-Matias-Szegedy / Cormode-Muthukrishnan,
    public) -- the statistic a distributed optimizer uses to size a
    join WITHOUT counting keys exactly.

    Same shuffle-safety as :func:`cms_counts`: each batch emits at most
    depth*width partial rows; keys never ship.  Returns one row
    (depth, width, estimate) -- deterministic, md5 hash family, SQL-
    replayable bit-for-bit."""
    def partial(b: pa.Table) -> pa.Table:
        keys = b[key_col].to_pylist()
        rows_out, buckets_out, counts_out = [], [], []
        for r in range(depth):
            hv = _md5_u64(keys, salt=str(r))
            bucket = (hv % np.uint64(width)).astype(np.int64)
            bc = np.bincount(bucket, minlength=width)
            nz = np.flatnonzero(bc)
            rows_out.append(np.full(len(nz), r, np.int64))
            buckets_out.append(nz.astype(np.int64))
            counts_out.append(bc[nz].astype(np.int64))
        return pa.table(
            {
                "row": pa.array(np.concatenate(rows_out), pa.int64()),
                "bucket": pa.array(np.concatenate(buckets_out), pa.int64()),
                "cnt": pa.array(np.concatenate(counts_out), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    import ray

    grid = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["row", "bucket"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_arrow_refs()
    )
    grid = pa.concat_tables([ray.get(r) for r in grid])
    counters = np.zeros((depth, width), np.int64)
    counters[
        np.asarray(grid["row"]), np.asarray(grid["bucket"])
    ] = np.asarray(grid["cnt"])
    est = int((counters.astype(object) ** 2).sum(axis=1).min())
    return pa.table(
        {
            "depth": pa.array([depth], pa.int64()),
            "width": pa.array([width], pa.int64()),
            "estimate": pa.array([est], pa.int64()),
        }
    )
