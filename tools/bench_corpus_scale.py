"""Corpus-flagship scale point: tile the sf documents table T times into
a mixed-duplication corpus and run the FULL LLM-corpus chain
(pipelines/corpus.py: exact dedup -> MinHash near-dup -> langid/
decontaminate/redact/token/split -> pack -> partitioned materialize),
reporting one JSON line.

Tile composition per copy t >= 1 of base doc d (copy 0 is the base row
verbatim):
  - 20%%: EXACT copy          (same text, new doc_id)
  - 20%%: NEAR-DUP copy       (last token dropped -- lands in the base
                               doc's MinHash cluster)
  - 60%%: shingle-distinct unique (doc-unique tokens interleaved every
                               3 tokens, so no 3-shingle survives -- the
                               NOTES r4 fixture lesson: one-token edits
                               collapse the whole tile into one cluster)

Usage:  python tools/bench_corpus_scale.py [--tiles 400] [--sf DIR]
        (tiles=100 -> 500k docs; tiles=400 -> 2M docs at sf0.1)
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

CACHE_ROOT = os.environ.get("M2R_BENCH_CACHE", "/dev/shm/m2r_bench")


def make_tiled_corpus(sf_dir: str, tiles: int, out: str) -> int:
    base = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    n = base.num_rows
    ids = np.asarray(base["doc_id"].to_numpy(zero_copy_only=False), np.int64)
    texts = base["text"].to_pylist()
    os.makedirs(out, exist_ok=True)
    total = 0
    for t in range(tiles):
        if t == 0:
            tab = pa.table(
                {"doc_id": pa.array(ids, pa.int64()),
                 "text": pa.array(texts, pa.string())}
            )
        else:
            new_ids = ids + t * 10_000_000
            kind = t % 5  # 1 exact + 1 near-dup + 3 unique per 5 tiles
            if kind == 1:
                new_texts = texts
            elif kind == 2:
                new_texts = [
                    " ".join(x.split()[:-1]) if x and len(x.split()) > 1
                    else x
                    for x in texts
                ]
            else:
                new_texts = [
                    " ".join(
                        w if i % 3 else f"u{t}x{j}w{i} {w}"
                        for i, w in enumerate(x.split())
                    )
                    if x else x
                    for j, x in enumerate(texts)
                ]
            tab = pa.table(
                {"doc_id": pa.array(new_ids, pa.int64()),
                 "text": pa.array(new_texts, pa.string())}
            )
        pq.write_table(tab, os.path.join(out, f"tile_{t:05d}.parquet"))
        total += tab.num_rows
    return total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", type=int, default=400)
    ap.add_argument("--sf", default=os.environ.get(
        "GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--num-cpus", type=int, default=int(os.environ.get(
        "RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--shuffle", action="store_true",
                    help="also time a shuffle_order=True pack pass "
                         "reusing the run's stage checkpoints")
    args = ap.parse_args()

    corpus = os.path.join(CACHE_ROOT, f"corpus_scale_t{args.tiles}")
    marker = os.path.join(corpus, "_COMPLETE")
    if not os.path.exists(marker):
        shutil.rmtree(corpus, ignore_errors=True)
        n_docs = make_tiled_corpus(args.sf, args.tiles, corpus)
        open(marker, "w").write(str(n_docs))
    n_docs = int(open(marker).read())

    import ray

    ray.init(address="local", num_cpus=args.num_cpus,
             include_dashboard=False, logging_level="ERROR")
    from marc2rdf_ray.pipelines.corpus import CorpusConfig, run_corpus_pipeline

    out_dir = os.path.join(CACHE_ROOT, f"corpus_scale_out_t{args.tiles}")
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.time()
    manifest = run_corpus_pipeline(corpus, out_dir, CorpusConfig())
    wall = time.time() - t0
    tokens = (manifest.extra or {}).get("total_tokens")
    print(json.dumps({
        "metric": "corpus flagship end-to-end sec",
        "value": round(wall, 1),
        "unit": "sec",
        "n_docs_in": n_docs,
        "survivors": manifest.triple_count,
        "tokens_packed": tokens,
        "partitions": manifest.num_partitions,
        "docs_per_sec": round(n_docs / wall, 1),
        "num_cpus": args.num_cpus,
    }))
    if args.shuffle:
        # second pass in the SAME out_dir with shuffle_order=True:
        # stages 1-3 checkpoints must be REUSED (their stamps exclude
        # pack knobs), so this times rank attach + rank-ordered pack
        t0 = time.time()
        m2 = run_corpus_pipeline(
            corpus, out_dir, CorpusConfig(shuffle_order=True)
        )
        wall2 = time.time() - t0
        print(json.dumps({
            "metric": "corpus flagship shuffled-pack stage sec "
                      "(stages 1-3 reused)",
            "value": round(wall2, 1),
            "unit": "sec",
            "survivors": m2.triple_count,
            "order": (m2.extra or {}).get("order"),
            "num_cpus": args.num_cpus,
        }))
    ray.shutdown()


if __name__ == "__main__":
    main()
