"""Windowed / streaming-shaped operators over event tables.

The reference's streaming story is time-windowed micro-batches
(oaiclient.rb:29-30 from/until harvest windows; SURVEY.md §2.9); the
tumbling-window analog is ``events_hourly`` in entry_queries.  This module
adds the gap-based SESSION window -- the custom windowed-aggregate
operator Ray Data lacks natively, built as composition (a) from SURVEY.md:
hash-bucket shuffle by user + one vectorized numpy pass per bucket.

Partitioning assumption (documented per the custom-operator rule): all
events of a user fit in one bucket task.  At 100 TB that holds because
buckets scale with the cluster (num_buckets ~ total cores) and a single
user's events are bounded; a pathological single-user firehose would need
a time-sliced pre-split, which composes in front of this op.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def sessionize(
    ds,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap_us: int = 1_800_000_000,
    num_buckets: int | None = None,
):
    """Gap-based sessions per user -> one row per session:
    (user_id, session_start_us, n_events, sum_value_cents).

    A new session starts when the gap to the previous event of the same
    user exceeds ``gap_us``.  Money is aggregated on integer cents
    (bit-exact vs a SQL oracle).  One shuffle (hash(user) % B); inside
    each bucket a single lexsort + reduceat pass -- no Python per event,
    no Python per user."""
    from ..functions.hashing import bucket_codes

    if num_buckets is None:
        try:
            import ray

            num_buckets = max(16, int(ray.cluster_resources().get("CPU", 8)) * 2)
        except Exception:
            num_buckets = 16

    def prep(b: pa.Table) -> pa.Table:
        from ..functions.numeric import sql_round_i64

        t = pa.table(
            {
                "u": b[user_col],
                "tus": pc.cast(b[ts_col], pa.int64()),
                # SQL tie semantics to match the oracle's ROUND(value*100)
                "vc": sql_round_i64(b[value_col], 100.0),
            }
        )
        return t.append_column(
            "bucket", bucket_codes(pc.cast(t["u"], pa.string()), num_buckets)
        )

    def sessions(group: pa.Table) -> pa.Table:
        u = np.asarray(group["u"].to_numpy(zero_copy_only=False), np.int64)
        tus = np.asarray(group["tus"].to_numpy(zero_copy_only=False), np.int64)
        vc = np.asarray(group["vc"].to_numpy(zero_copy_only=False), np.int64)
        order = np.lexsort((tus, u))
        u, tus, vc = u[order], tus[order], vc[order]
        brk = np.empty(len(u), bool)
        brk[0:1] = True
        if len(u) > 1:
            brk[1:] = (u[1:] != u[:-1]) | ((tus[1:] - tus[:-1]) > gap_us)
        starts = np.flatnonzero(brk)
        counts = np.diff(np.append(starts, len(u)))
        return pa.table(
            {
                "user_id": pa.array(u[starts], pa.int64()),
                "session_start_us": pa.array(tus[starts], pa.int64()),
                "n_events": pa.array(counts.astype(np.int64), pa.int64()),
                "sum_value_cents": pa.array(
                    np.add.reduceat(vc, starts), pa.int64()
                ),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(sessions, batch_format="pyarrow")
    )
