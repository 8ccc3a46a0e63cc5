"""Benchmark harness (driver contract).

Runs the headline pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) in a fresh local Ray session with
``num_cpus=$RAY_GRAFT_CPUS`` (default 32) and prints ONE JSON line:

  {"metric": "...", "value": <headline seconds>, "unit": "sec",
   "queries": {...per-query seconds...}, "sf": ..., "num_cpus": N,
   "triples": T, "triples_per_sec": R}

Headline = the flagship KG pipeline (extract -> link -> canonicalize ->
materialize, BASELINE.json metric) over a synthetic pages corpus sized
10 pages per `documents` row of the sf dir (deterministic, cached in /tmp).

``--scaling``: runs the headline twice in fresh subprocesses at 8 and 32
CPUs on the SAME corpus and reports throughput at both plus scaling
efficiency (throughput ratio / CPU ratio), per the two-cluster-size rule.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
PAGES_PER_DOC = int(os.environ.get("M2R_PAGES_PER_DOC", "25"))
CACHE_ROOT = os.environ.get("M2R_BENCH_CACHE", "/tmp/m2r_bench")


def _doc_rows(sf_dir: str) -> int:
    import pyarrow.parquet as pq

    return pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows


def ensure_corpus(n_pages: int) -> str:
    """Deterministic cached pages corpus (also warms the page cache)."""
    path = os.path.join(CACHE_ROOT, f"pages_n{n_pages}_s42")
    marker = os.path.join(path, "_COMPLETE")
    if not os.path.exists(marker):
        shutil.rmtree(path, ignore_errors=True)
        from marc2rdf_ray.sources.pages import write_pages_dataset

        write_pages_dataset(path, n_pages, seed=42)
        open(marker, "w").write("ok")
    else:
        # warm OS page cache so both scaling runs see hot input
        for root, _, names in os.walk(path):
            for n in names:
                with open(os.path.join(root, n), "rb") as f:
                    while f.read(1 << 22):
                        pass
    return path


def run_headline(pages_dir: str) -> tuple[float, int]:
    from marc2rdf_ray.config import PipelineConfig
    from marc2rdf_ray.pipelines.kg import run_kg_pipeline

    out_dir = os.path.join(CACHE_ROOT, f"graph_out_{NUM_CPUS}")
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.time()
    manifest = run_kg_pipeline(pages_dir, out_dir, PipelineConfig(),
                               checkpoint_mode="memory")
    wall = time.time() - t0
    return wall, manifest.triple_count


def run_queries(sf_dir: str) -> dict[str, float]:
    """Representative per-operator timings over the sf tables."""
    from marc2rdf_ray import entry_queries as eq

    names = [
        "kg_triples",
        "kg_dedup_edges",
        "q1_pricing_summary",
        "revenue_by_segment",
        "events_hourly",
        "docs_token_stats",
        "dedup_exact",
        "dedup_minhash",
        "ann_brute_topk",
    ]
    out = {}
    for name in names:
        fn = eq.QUERIES[name]
        t0 = time.time()
        res = fn(sf_dir)
        # consume without materializing to the driver
        if hasattr(res, "count"):
            res.count()
        out[name] = round(time.time() - t0, 3)
    return out


def main() -> None:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import logging

    logging.getLogger("ray.data").setLevel(logging.CRITICAL)

    n_pages = PAGES_PER_DOC * _doc_rows(SF_DIR)
    pages_dir = ensure_corpus(n_pages)

    wall, triples = run_headline(pages_dir)
    queries = run_queries(SF_DIR)

    result = {
        "metric": (
            "flagship KG pipeline end-to-end seconds "
            "(extract->link->canonicalize->materialize)"
        ),
        "value": round(wall, 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "n_pages": n_pages,
        "triples": triples,
        "triples_per_sec": round(triples / wall, 1),
    }
    ray.shutdown()
    print(json.dumps(result))


def scaling() -> None:
    """Same job, fresh processes, 8 vs 32 CPUs -> scaling efficiency."""

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo_cpu, hi_cpu = 8, 32
    run(lo_cpu)  # untimed warm-up pass: builds/warms the corpus cache
    lo = run(lo_cpu)
    hi = run(hi_cpu)
    tp_lo = lo["triples"] / lo["value"]
    tp_hi = hi["triples"] / hi["value"]
    eff = (tp_hi / tp_lo) / (hi_cpu / lo_cpu)
    print(
        json.dumps(
            {
                "metric": "scaling efficiency (throughput ratio / cpu ratio)",
                "cpus": [lo_cpu, hi_cpu],
                "sec": [lo["value"], hi["value"]],
                "triples_per_sec": [round(tp_lo, 1), round(tp_hi, 1)],
                "scaling_efficiency": round(eff, 3),
                "n_pages": lo["n_pages"],
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
