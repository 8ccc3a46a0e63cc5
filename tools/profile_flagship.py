"""Stage-level profile of the flagship pipeline (next-lever finder).

Runs extract->checkpoint and canonicalize->materialize as separately timed
phases over a pages corpus and dumps Ray's operator stats for the big
exchange.  Usage:

    python tools/profile_flagship.py [pages_dir] [num_cpus]

Defaults: the 200k-page bench corpus, 32 CPUs.  Output dir is scratch
(/dev/shm) and removed first.
"""

from __future__ import annotations

import os
import shutil
import sys
import time


def main() -> int:
    pages_dir = (
        sys.argv[1]
        if len(sys.argv) > 1
        else "/dev/shm/m2r_bench/pages_v3_n200000_s42"
    )
    ncpu = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    import logging

    logging.getLogger("ray.data").setLevel(logging.CRITICAL)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import ray.data as rd

    from marc2rdf_ray.config import PipelineConfig
    from marc2rdf_ray.pipelines.kg import (
        TRIPLE_COLS,
        canonical_edges,
        extract_triples,
        sameas_key_pred_for,
    )
    from marc2rdf_ray.stages.link import build_alias_dict
    from marc2rdf_ray.stages.materialize import materialize_graph

    out_dir = "/dev/shm/m2r_profile_out"
    shutil.rmtree(out_dir, ignore_errors=True)
    config = PipelineConfig()

    t0 = time.time()
    pages = rd.read_parquet(pages_dir, columns=["url", "html"])
    raw = extract_triples(pages, config, build_alias_dict())
    import pyarrow as pa
    import pyarrow.compute as pc

    ckpt = os.path.join(out_dir, "_raw_triples")

    def add_pk(b: pa.Table) -> pa.Table:
        return b.append_column(
            "pk",
            pc.cast(
                pc.equal(b["pred"], pa.scalar(sameas_key_pred_for(config))),
                pa.int8(),
            ),
        )

    raw.map_batches(add_pk, batch_format="pyarrow").write_parquet(
        ckpt, partition_cols=["pk"]
    )
    t1 = time.time()
    print(f"phase extract+checkpoint: {t1 - t0:.1f}s")

    raw2 = rd.read_parquet(ckpt, columns=TRIPLE_COLS)
    key = rd.read_parquet(os.path.join(ckpt, "pk=1"), columns=TRIPLE_COLS)
    edges = canonical_edges(raw2, pre_dedup=False, key_triples=key)
    m = materialize_graph(
        edges, out_dir, ruleset_hash=config.ruleset_hash(),
        input_paths=[pages_dir], dedup=True,
    )
    t2 = time.time()
    print(f"phase canonicalize+materialize: {t2 - t1:.1f}s")
    print(f"total: {t2 - t0:.1f}s  triples={m.triple_count} "
          f"parts={m.num_partitions} "
          f"throughput={m.triple_count / (t2 - t0):,.0f} triples/s")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
