"""CLI entry points (the marc2rdf.rb + scheduler.rb analogs).

One-shot converter (default mode):

    python -m marc2rdf_ray --pages /data/pages --out /data/graph \
        [--mapping mapping.json] [--limit N] [--since ISO --until ISO] \
        [--num-cpus N] [--partitions P] [--no-link]

Subcommands:

    python -m marc2rdf_ray sync-windows --root /data/windows --out /data/graph
        Fold every window subdir under --root into the graph exactly once
        (the scheduler.rb daily-cycle analog; idempotent, crash-resumable).

    python -m marc2rdf_ray merge-window --pages /data/windows/day2 --out /data/graph
        Fold ONE new window into an existing graph (partition-level merge).

    python -m marc2rdf_ray corpus --docs /data/docs --out /data/clean \
        [--min-tokens N] [--pack-budget N] [--partitions P]
        The LLM-corpus flagship chain (dedup -> near-dup -> filter ->
        redact -> split -> pack -> partitioned materialize).

The only place in the library that owns a Ray session.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_init(num_cpus=None):
    """Own the Ray session.  ``RAY_ADDRESS`` decides the deployment:
    unset/"local" starts a local session (the test/sandbox shape); any
    other value (``auto``, ``ray://head:10001``) attaches to the running
    cluster -- the ``ray job submit`` path, where the cluster's own
    resources apply and ``num_cpus`` must NOT be constrained here."""
    import os

    import ray

    if not ray.is_initialized():
        address = os.environ.get("RAY_ADDRESS") or "local"
        kwargs = dict(
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
        if address == "local":
            kwargs["num_cpus"] = num_cpus
        ray.init(address=address, **kwargs)
    return ray


def _manifest_json(manifest, out: str) -> str:
    return json.dumps(
        {
            "rows": manifest.triple_count,
            "partitions": manifest.num_partitions,
            "ruleset_hash": manifest.ruleset_hash,
            "out": out,
        }
    )


def corpus_main(argv) -> int:
    p = argparse.ArgumentParser(prog="marc2rdf_ray corpus")
    p.add_argument("--docs", required=True, help="documents parquet dir/file")
    p.add_argument("--out", required=True, help="output dir")
    p.add_argument("--min-tokens", type=int, default=20)
    p.add_argument("--pack-budget", type=int, default=512)
    p.add_argument("--partitions", type=int, default=None)
    args = p.parse_args(argv)
    ray = _ray_init()
    try:
        from .pipelines.corpus import CorpusConfig, run_corpus_pipeline

        m = run_corpus_pipeline(
            args.docs,
            args.out,
            CorpusConfig(
                min_tokens=args.min_tokens,
                pack_budget=args.pack_budget,
                num_partitions=args.partitions,
            ),
        )
        print(_manifest_json(m, args.out))
        return 0
    finally:
        ray.shutdown()


def merge_window_main(argv) -> int:
    p = argparse.ArgumentParser(prog="marc2rdf_ray merge-window")
    p.add_argument("--pages", required=True, help="new window pages dir")
    p.add_argument("--out", required=True, help="existing graph dir")
    p.add_argument("--mapping", help="rule-set JSON path")
    p.add_argument("--no-link", action="store_true")
    args = p.parse_args(argv)
    ray = _ray_init()
    try:
        from .config import PipelineConfig
        from .pipelines.incremental import merge_window_into_graph

        m = merge_window_into_graph(
            args.pages, args.out, PipelineConfig(mapping=args.mapping),
            link=not args.no_link,
        )
        print(_manifest_json(m, args.out))
        return 0
    finally:
        ray.shutdown()


def sync_windows_main(argv) -> int:
    p = argparse.ArgumentParser(prog="marc2rdf_ray sync-windows")
    p.add_argument("--root", required=True, help="dir of window subdirs")
    p.add_argument("--out", required=True, help="graph dir")
    p.add_argument("--mapping", help="rule-set JSON path")
    p.add_argument("--no-link", action="store_true")
    args = p.parse_args(argv)
    ray = _ray_init()
    try:
        from .config import PipelineConfig
        from .pipelines.incremental import sync_windows

        m = sync_windows(
            args.root, args.out, PipelineConfig(mapping=args.mapping),
            link=not args.no_link,
        )
        print(_manifest_json(m, args.out))
        return 0
    finally:
        ray.shutdown()


def watch_windows_main(argv) -> int:
    p = argparse.ArgumentParser(prog="marc2rdf_ray watch-windows")
    p.add_argument("--root", required=True, help="dir of window subdirs")
    p.add_argument("--out", required=True, help="graph dir")
    p.add_argument("--mapping", help="rule-set JSON path")
    p.add_argument("--no-link", action="store_true")
    p.add_argument("--poll-secs", type=float, default=30.0)
    p.add_argument(
        "--max-cycles", type=int, default=None,
        help="stop after N poll cycles (default: run until killed)",
    )
    p.add_argument(
        "--marker", default="_complete",
        help="sentinel file a producer writes LAST to seal a drop",
    )
    args = p.parse_args(argv)
    ray = _ray_init()
    try:
        from .config import PipelineConfig
        from .pipelines.incremental import watch_windows

        def on_cycle(i, m):
            n = m.triple_count if m else 0
            print(f'{{"cycle": {i}, "triples": {n}}}', flush=True)

        m = watch_windows(
            args.root, args.out, PipelineConfig(mapping=args.mapping),
            link=not args.no_link, poll_secs=args.poll_secs,
            max_cycles=args.max_cycles, marker_name=args.marker,
            on_cycle=on_cycle,
        )
        if m is not None:
            print(_manifest_json(m, args.out))
        return 0
    finally:
        ray.shutdown()


_SUBCOMMANDS = {
    "corpus": corpus_main,
    "merge-window": merge_window_main,
    "sync-windows": sync_windows_main,
    "watch-windows": watch_windows_main,
}


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if argv and argv[0] in _SUBCOMMANDS:
        return _SUBCOMMANDS[argv[0]](argv[1:])
    return _convert_main(argv)


def _convert_main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Ray-Data KG construction pipeline")
    p.add_argument("--pages", required=True, help="pages parquet dir/file")
    p.add_argument("--out", required=True, help="output graph dir")
    p.add_argument("--mapping", help="rule-set JSON path (default: built-in)")
    p.add_argument("--limit", type=int, help="convert only N pages (-r analog)")
    p.add_argument("--since", help="warc_ts window start (ISO)")
    p.add_argument("--until", help="warc_ts window end (ISO)")
    p.add_argument("--num-cpus", type=int, default=None)
    p.add_argument("--partitions", type=int, default=None)
    p.add_argument("--no-link", action="store_true", help="skip entity linking")
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    try:
        from .config import PipelineConfig
        from .pipelines.kg import run_kg_pipeline
        from .sources.incremental import read_pages_window

        config = PipelineConfig(mapping=args.mapping)
        if args.since or args.until or args.limit:
            pages = read_pages_window(
                args.pages, args.since, args.until, columns=["url", "html"]
            )
            if args.limit:
                pages = pages.limit(args.limit)
            manifest = run_kg_pipeline(
                pages, args.out, config,
                link=not args.no_link,
                num_partitions=args.partitions,
            )
        else:
            manifest = run_kg_pipeline(
                args.pages, args.out, config,
                link=not args.no_link,
                num_partitions=args.partitions,
            )
        print(
            json.dumps(
                {
                    "triples": manifest.triple_count,
                    "partitions": manifest.num_partitions,
                    "ruleset_hash": manifest.ruleset_hash,
                    "out": args.out,
                }
            )
        )
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
