"""Round-5 task #9: flagship at 8M pages (one notch past the 4M/2M scale
points), pages GENERATED INLINE as a Dataset (no input parquet -- the
54 GB input would not fit next to checkpoint+output on this host's disk;
the pipeline path is identical because run_kg_pipeline accepts a
Dataset).  Run A = auto-sharded materialize; run B = forced shards, for
the byte-identical replay check.

Usage: python tools/bench_flagship_8m.py [n_pages] [cpus]
"""

from __future__ import annotations

import os
import shutil
import sys
import time


def run_once(n: int, out_dir: str, shards: int, ncpu: int) -> dict:
    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    import logging

    for nm in ("ray.data", "ray"):
        logging.getLogger(nm).setLevel(logging.CRITICAL)
    logging.getLogger("marc2rdf_ray").setLevel(logging.INFO)
    logging.basicConfig(level=logging.INFO)

    import ray.data as rd

    from marc2rdf_ray.config import PipelineConfig
    from marc2rdf_ray.pipelines.kg import run_kg_pipeline
    from marc2rdf_ray.sources.pages import gen_pages_batch

    blocks = max(64, n // 20000)
    pages = rd.range(n, override_num_blocks=blocks).map_batches(
        lambda b: gen_pages_batch(b, 42), batch_format="pyarrow"
    )
    cfg = PipelineConfig(materialize_shards=shards)
    t0 = time.time()
    m = run_kg_pipeline(pages, out_dir, cfg)
    wall = time.time() - t0
    counts = dict(sorted(m.partition_counts.items()))
    ray.shutdown()
    return {"wall": wall, "triples": m.triple_count, "counts": counts,
            "parts": m.num_partitions}


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    ncpu = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    base = "/tmp/flag8m"
    shutil.rmtree(base, ignore_errors=True)

    a = run_once(n, os.path.join(base, "a"), 0, ncpu)
    print(f"RUN A (auto shards): {a['wall']:.1f}s, triples={a['triples']}, "
          f"{a['triples']/a['wall']:.0f}/s, parts={a['parts']}", flush=True)
    shutil.rmtree(os.path.join(base, "a"), ignore_errors=True)

    b = run_once(n, os.path.join(base, "b"), 8, ncpu)
    print(f"RUN B (shards=8):   {b['wall']:.1f}s, triples={b['triples']}, "
          f"{b['triples']/b['wall']:.0f}/s", flush=True)

    same = a["triples"] == b["triples"] and a["counts"] == b["counts"]
    print(f"REPLAY IDENTICAL: {same} "
          f"({a['triples']} vs {b['triples']})", flush=True)
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
