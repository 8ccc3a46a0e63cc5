"""CLI entry point: the one-shot converter (marc2rdf.rb analog).

    python -m marc2rdf_ray --pages /data/pages --out /data/graph \
        [--mapping mapping.json] [--limit N] [--since ISO --until ISO] \
        [--num-cpus N] [--partitions P] [--no-link]

The only place in the library that owns a Ray session.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
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
