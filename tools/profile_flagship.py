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


def hotpath(n_pages: int = 3000) -> int:
    """--hotpath: single-threaded per-stage breakdown of the fused
    extractor (VERDICT r3 #9) -- parse vs record-lowering vs rule eval vs
    work-derive vs linking vs Arrow table build -- plus a cProfile top
    list over the whole loop.  No Ray session."""
    import cProfile
    import pstats
    import time as _t

    import pyarrow.parquet as pq

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from marc2rdf_ray.config import PipelineConfig
    from marc2rdf_ray.pipelines.kg import derive_work_triples
    from marc2rdf_ray.stages.extract import page_to_record
    from marc2rdf_ray.stages.fast_extract import parse_page_fused
    from marc2rdf_ray.stages.link import EntityLinker, build_alias_dict
    from marc2rdf_ray.stages.triples import triples_to_table

    corpus = "/dev/shm/m2r_bench/pages_v3_n200000_s42"
    files = sorted(
        os.path.join(corpus, f)
        for f in os.listdir(corpus)
        if f.endswith(".parquet")
    )
    rows = []
    for f in files:
        t = pq.read_table(f, columns=["url", "html"])
        htmls = [
            h.decode("utf-8", "replace") if isinstance(h, bytes) else h
            for h in t["html"].to_pylist()
        ]
        rows.extend(zip(t["url"].to_pylist(), htmls))
        if len(rows) >= n_pages:
            break
    rows = rows[:n_pages]
    engine = PipelineConfig().build_engine()
    linker = EntityLinker(build_alias_dict())

    def stage_times():
        out = {}
        t0 = _t.perf_counter()
        parsed = [parse_page_fused(h) for _, h in rows]
        out["parse_page_fused"] = _t.perf_counter() - t0
        t0 = _t.perf_counter()
        texts = [p.text() for p in parsed]
        out["text_assembly"] = _t.perf_counter() - t0
        t0 = _t.perf_counter()
        recs = [page_to_record(u, h) for u, h in rows]
        out["page_to_record (incl parse+text)"] = _t.perf_counter() - t0
        t0 = _t.perf_counter()
        triples = [engine.convert(r) for r, _ in recs]
        out["rules engine.convert"] = _t.perf_counter() - t0
        t0 = _t.perf_counter()
        for (u, _), tr in zip(rows, triples):
            derive_work_triples(tr, u)
        out["derive_work_triples"] = _t.perf_counter() - t0
        t0 = _t.perf_counter()
        for txt in texts:
            list(linker.link_text(txt))
        out["linker.link_text"] = _t.perf_counter() - t0
        t0 = _t.perf_counter()
        flat, srcs = [], []
        for (u, _), tr in zip(rows, triples):
            flat.extend(tr)
            srcs.extend([u] * len(tr))
        triples_to_table(flat, srcs)
        out["triples_to_table"] = _t.perf_counter() - t0
        return out

    times = stage_times()
    total = sum(times.values())
    print(f"pages={len(rows)}  stage breakdown (serial, 1 thread):")
    for k, v in sorted(times.items(), key=lambda kv: -kv[1]):
        print(f"  {k:38s} {v:7.3f}s  {v / len(rows) * 1e3:6.3f} ms/page")
    print(f"  {'TOTAL (stages, parse 2x via record)':38s} {total:7.3f}s")

    def full_loop():
        for u, h in rows:
            rec, text = page_to_record(u, h)
            tr = engine.convert(rec)
            tr.extend(derive_work_triples(tr, u))
            list(linker.link_text(text))

    t0 = _t.perf_counter()
    full_loop()
    wall = _t.perf_counter() - t0
    print(f"fused loop: {wall:.3f}s = {wall / len(rows) * 1e3:.3f} ms/page "
          f"({len(rows) / wall:,.0f} pages/s/core)")

    prof = cProfile.Profile()
    prof.enable()
    full_loop()
    prof.disable()
    stats = pstats.Stats(prof)
    stats.sort_stats("cumulative")
    print("\ncProfile top 18 by cumtime:")
    stats.print_stats(18)
    return 0


if __name__ == "__main__":
    if "--hotpath" in sys.argv:
        n = int(sys.argv[sys.argv.index("--hotpath") + 1]) if len(
            sys.argv) > sys.argv.index("--hotpath") + 1 else 3000
        raise SystemExit(hotpath(n))
    raise SystemExit(main())
