"""Graph materialization: sorted N-Triples + Parquet edge tables
partitioned by subject hash, with per-partition lineage manifests.

Sink analog of the reference's NT writer + Virtuoso bulk load
(rdfmodeler.rb:314-324; tools/isql/import_books_graph.isql:3-7), redesigned
for resumable distributed output (SURVEY.md §2.2 K1/K2):

- partition key: ``crc32(subj) % P`` -- co-locates every edge of a subject,
  so "sorted N-Triples" means sorted WITHIN a hash partition (the only sane
  definition at 10^12 docs; SURVEY.md §7.4 'Ordering').
- each partition directory gets Parquet part files plus one ``part-*.nt``;
  a run-level ``_manifest.json`` records input signature, rule-set hash and
  per-partition triple counts; a matching manifest short-circuits the run.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..functions.hashing import bucket_codes
from ..functions.ntriples import format_batch_arrow_payload
from ..state.manifest import (
    RunManifest,
    input_signature,
    list_input_files,
    matches,
    read_manifest,
    write_manifest,
)

PART_COL = "part"


def add_partition_column(batch: pa.Table, num_partitions: int) -> pa.Table:
    """hash(subj) % P as int32 -- columnar (functions.hashing), stable
    across runs/processes within an environment (what manifests need)."""
    return batch.append_column(
        PART_COL, bucket_codes(batch["subj"], num_partitions)
    )


def write_sorted_partition(
    group: pa.Table, out_dir: str, dedup: bool = False,
    run_sig: str = "",
) -> pa.Table:
    """Per-partition writer task: (optionally dedup,) sort within partition,
    write Parquet + NT.

    Runs inside ``groupby(part).map_groups`` -- each partition is one task,
    output files are deterministic per partition id, so re-running
    overwrites idempotently (K2's append replaced by partition overwrite).

    PARTITION-LEVEL RESUME (``run_sig``): the last write per partition is
    an atomic ``_sig`` marker carrying the run signature.  A re-run of a
    CRASHED job (same inputs/rules/partitioning => same signature) skips
    the sort+write for partitions whose marker matches -- partition
    content is deterministic given (inputs, rules), so the existing files
    are exactly what this task would produce.  Writes are tmp+rename and
    the marker is written LAST, so a killed task can never leave a marked
    partial partition.

    ``dedup=True`` makes the partition shuffle double as the GLOBAL exact
    triple dedup: every copy of a triple shares its subject, hence its
    partition, so per-partition dedup is globally exact -- and the pipeline
    saves an entire extra shuffle.
    """
    import time as _time

    from .canonicalize import TRIPLE_KEY_COLS

    _timing = os.environ.get("M2R_WRITE_TIMING")
    _t0 = _time.monotonic()

    part = int(group[PART_COL][0].as_py())
    pdir = os.path.join(out_dir, f"part={part:05d}")
    sig_path = os.path.join(pdir, "_sig")
    if run_sig:
        try:
            with open(sig_path) as f:
                if f.read().strip() == run_sig:
                    rows = pq.read_metadata(
                        os.path.join(pdir, "edges.parquet")
                    ).num_rows
                    return pa.table(
                        {"part": pa.array([part], pa.int32()),
                         "rows": pa.array([rows], pa.int64())}
                    )
        except OSError:
            pass
    # ONE sort does double duty: output ordering (O6) AND exact dedup.
    # Sorting by all six columns makes key-equal rows adjacent, so dedup is
    # a vectorized neighbor-equality mask -- no second hash aggregation,
    # and it sidesteps the pyarrow 16.1 grouper bug entirely (constant
    # int32 key + null-bearing string keys miscounts groups; the old
    # group_by-based dedup had to drop PART_COL to dodge it --
    # tests/test_pipeline.py still guards the dedup invariant).  Sorting
    # src last reproduces the group_by path's min(src) pick exactly
    # (nulls sort last; Arrow's min skips nulls).
    data = group.drop_columns([PART_COL])
    sort_cols = [c for c in TRIPLE_KEY_COLS if c in data.column_names]
    other_cols = [c for c in data.column_names if c not in sort_cols]
    data = data.sort_by([(c, "ascending") for c in sort_cols + other_cols])
    _t1 = _time.monotonic()
    if dedup and len(data) > 1:
        dup = None  # row i+1 duplicates row i iff equal on ALL key cols
        for c in sort_cols:
            col = data[c].combine_chunks()
            hi, lo = col.slice(1), col.slice(0, len(data) - 1)
            same = pc.or_kleene(
                pc.equal(hi, lo), pc.and_(pc.is_null(hi), pc.is_null(lo))
            )
            same = pc.fill_null(same, False)
            dup = same if dup is None else pc.and_(dup, same)
        if isinstance(dup, pa.ChunkedArray):
            dup = dup.combine_chunks()
        mask = pa.concat_arrays([pa.array([True]), pc.invert(dup)])
        data = data.filter(mask)
    _t2 = _time.monotonic()
    os.makedirs(pdir, exist_ok=True)
    tmp_pq = os.path.join(pdir, ".edges.parquet.tmp")
    pq.write_table(data, tmp_pq)
    os.replace(tmp_pq, os.path.join(pdir, "edges.parquet"))
    _t3 = _time.monotonic()

    # vectorized formatting; invalid statements skipped; the payload stays
    # in Arrow until the single final join -- no per-line Python objects
    payload = format_batch_arrow_payload(data)
    # gzip level 1: ~6x smaller NT -> serial disk IO becomes parallel CPU
    # (each partition task compresses its own shard); plain-text NT is one
    # `zcat` away, and bulk loaders read .nt.gz natively.
    import gzip

    tmp = os.path.join(pdir, ".edges.nt.gz.tmp")
    with gzip.open(tmp, "wb", compresslevel=1) as f:
        f.write(payload)
    os.replace(tmp, os.path.join(pdir, "edges.nt.gz"))

    if run_sig:  # marker LAST: presence certifies a complete partition
        tmp_sig = sig_path + ".tmp"
        with open(tmp_sig, "w") as f:
            f.write(run_sig)
        os.replace(tmp_sig, sig_path)
    if _timing:
        _t4 = _time.monotonic()
        print(
            f"M2R_WRITE_TIMING part={part} rows_in={len(group)} "
            f"rows_out={len(data)} sort={_t1 - _t0:.2f} dedup={_t2 - _t1:.2f} "
            f"parquet={_t3 - _t2:.2f} nt={_t4 - _t3:.2f} total={_t4 - _t0:.2f}",
            flush=True,
        )

    return pa.table({"part": pa.array([part], pa.int32()),
                     "rows": pa.array([len(data)], pa.int64())})


_PARTITION_EXPANSION = 3.0  # triples bytes ~ pages-parquet bytes x this


def choose_num_partitions(
    input_bytes: int, target_partition_bytes: int = 128 << 20
) -> int:
    """Size the output partition count from input bytes.

    Each partition is sorted+written by ONE task holding the partition in
    memory (in-memory Arrow ~3x its on-disk size), so the per-task memory
    bound is ``target_partition_bytes * ~3``; partition count scales with
    input size instead of being a fixed constant (VERDICT r1 #4).  Floor:
    2 partitions per CPU keeps the write parallel on small inputs."""
    try:
        import ray

        floor = max(16, int(ray.cluster_resources().get("CPU", 8)) * 2)
    except Exception:
        floor = 16
    est = int(input_bytes * _PARTITION_EXPANSION)
    need = -(-est // target_partition_bytes) if est > 0 else 1
    return max(floor, min(65536, need))


def materialize_graph(
    triples_ds,
    out_dir: str,
    *,
    num_partitions: int | None = None,
    ruleset_hash: str = "",
    input_paths: list[str] | None = None,
    extra: dict | None = None,
    dedup: bool = False,
    target_partition_bytes: int = 128 << 20,
    preserve_src_prefixes: list[str] | None = None,
) -> RunManifest:
    """Write the edge table partitioned+sorted; returns the run manifest.

    Resume: when ``_manifest.json`` matches (same inputs, same rule set),
    the whole write is skipped and the prior manifest returned.

    Preserve-on-update (``preserve_src_prefixes``): on a NON-matching
    manifest (changed inputs or rules), edges from the previous output
    whose ``src`` starts with one of the prefixes (e.g. ``enrich:``,
    ``sameas:``) are carried forward into the new graph before the old
    partitions are replaced -- the recompute analog of the reference's
    ``preserve_on_update`` predicate lists and preserve-filtered DELETEs
    (sparql_update.rb:30-78, clear_books_graph.isql:15-30; SURVEY.md §2.8
    U2/U3/U6).  Requires the input dataset to carry the full 6-column
    triples layout.  Combine with ``dedup=True`` so carried-forward edges
    that the new run also produces collapse to one copy.

    Replace semantics: a non-matching manifest means recompute -- every
    existing ``part=*`` directory whose ``_sig`` marker does not certify
    THIS run's signature is deleted before the write, so a run with fewer
    partitions (or fewer touched subjects) cannot leave stale partition
    files behind for globbing consumers.  Directories whose marker DOES
    match (a crashed run of the identical job) survive and their
    sort+write is skipped -- partition-level resume.  Windowed/incremental
    runs must target their own out_dir (and merge explicitly), never
    append into a previous run's directory.

    ``num_partitions=None`` => adaptive via ``choose_num_partitions``
    (input-byte-scaled; fixed constants stop being valid the moment the
    input grows 1000x).
    """
    import shutil

    files = []
    for p in input_paths or []:
        files.extend(list_input_files(p))
    sig = input_signature(files) if files else ""
    existing = read_manifest(out_dir)
    if sig and matches(existing, sig, ruleset_hash):
        return existing

    if num_partitions is None:
        in_bytes = 0
        for f in files:
            try:
                in_bytes += os.path.getsize(f)
            except OSError:
                pass
        num_partitions = choose_num_partitions(in_bytes, target_partition_bytes)

    # carry preserved edges forward BEFORE the old partitions are dropped
    preserved = None
    if preserve_src_prefixes and existing is not None and os.path.isdir(out_dir):
        import ray.data as rd

        part_files = [
            os.path.join(out_dir, d, "edges.parquet")
            for d in os.listdir(out_dir)
            if d.startswith("part=")
        ]
        part_files = [p for p in part_files if os.path.isfile(p)]
        prefixes = list(preserve_src_prefixes)

        def keep_preserved(b: pa.Table) -> pa.Table:
            cols = ["subj", "pred", "obj", "obj_kind", "lang", "src"]
            if len(b) == 0 or "src" not in b.column_names:
                return b.select([c for c in cols if c in b.column_names]).slice(0, 0)
            src = pc.coalesce(b["src"], pa.scalar("", pa.string()))
            mask = None
            for p in prefixes:
                m = pc.starts_with(src, pattern=p)
                mask = m if mask is None else pc.or_(mask, m)
            return b.filter(mask).select(cols)

        if part_files:
            preserved = (
                rd.read_parquet(part_files)
                .map_batches(keep_preserved, batch_format="pyarrow")
                .materialize()  # must be off disk before the dirs go away
            )
            if preserved.count() == 0:
                preserved = None

    # partition-resume signature: identical (inputs, rules, partitioning)
    # => identical deterministic partition content
    run_sig = (
        f"{sig}:{ruleset_hash}:{num_partitions}:{int(dedup)}" if sig else ""
    )

    # drop stale partitions: anything whose _sig doesn't certify THIS run's
    # signature (a crashed identical run's finished partitions survive and
    # are skipped by the writer -- partition-level resume)
    if os.path.isdir(out_dir):
        for d in os.listdir(out_dir):
            if not d.startswith("part="):
                continue
            keep = False
            if run_sig:
                try:
                    with open(os.path.join(out_dir, d, "_sig")) as f:
                        keep = f.read().strip() == run_sig
                except OSError:
                    keep = False
            if not keep:
                shutil.rmtree(os.path.join(out_dir, d), ignore_errors=True)

    if preserved is not None:
        triples_ds = triples_ds.union(preserved)

    def prep(b: pa.Table) -> pa.Table:
        if dedup:
            # per-batch pre-dedup BEFORE the shuffle: hot entities (e.g. an
            # author on 20% of pages) emit IDENTICAL triples from every
            # record; collapsing them locally is what defuses hot-key skew
            # in the partition exchange (the salting equivalent -- the
            # merge is a set union, associative+commutative).
            from .canonicalize import TRIPLE_KEY_COLS, local_dedup

            keys = [c for c in TRIPLE_KEY_COLS if c in b.column_names]
            b = local_dedup(b, keys)
        return add_partition_column(b, num_partitions)

    # NOTE deliberately NO repartition() here: a repartition feeding the
    # sort exchange stacks two all-to-all operators, each buffering the
    # whole dataset in the object store -- at 1M pages (~132M intermediate
    # rows, ~2x store capacity) the streaming executor wedges with zero
    # runnable tasks (observed; round-2).  Callers with many tiny upstream
    # blocks coalesce at the SOURCE instead (read_parquet
    # override_num_blocks -- see pipelines/kg.py), which costs nothing and
    # keeps exactly one all-to-all in this pipeline.
    parted = triples_ds.map_batches(prep, batch_format="pyarrow")
    counts_ds = parted.groupby(PART_COL).map_groups(
        lambda g: write_sorted_partition(
            g, out_dir, dedup=dedup, run_sig=run_sig
        ),
        batch_format="pyarrow",
    )
    counts = {str(r["part"]): r["rows"] for r in counts_ds.take_all()}

    manifest = RunManifest(
        input_signature=sig,
        ruleset_hash=ruleset_hash,
        num_partitions=num_partitions,
        triple_count=sum(counts.values()),
        partition_counts=counts,
        extra=extra or {},
    )
    write_manifest(out_dir, manifest)
    return manifest
