"""CLI entry point — the ``scrapy crawl`` analogue (SURVEY.md §3.1/§3.2).

The library API (`engine.crawl`) is the CrawlerRunner analogue; this module
is the thin `scrapy/cmdline.py::execute` wrapper over it, shaped for the
north rule's submission path::

    # local
    python -m scrapy__ray crawl --corpus /tmp/corpus --out /tmp/crawl_out
    # cluster (the driver process runs this same command inside the job)
    ray job submit --working-dir . -- \
        python -m scrapy__ray crawl --corpus <dir> --out <dir> --resume

Scrapy-parity notes:
  * ``--set name=value`` mirrors ``scrapy crawl -s NAME=VALUE``: any
    CrawlConfig field can be overridden by its (snake_case) name, parsed to
    the field's declared type — the Settings layering analogue
    (`scrapy/settings/__init__.py`), with CLI as the highest priority.
  * ``crawl`` owns the Ray session (init if absent, shutdown on exit) —
    under ``ray job submit`` the preset RAY_ADDRESS routes init to the
    running cluster; standalone it starts a local one.  The library API
    never calls ray.init (driver-contract rule).
  * ``gen`` materializes a deterministic fixture corpus (FIXTURES.md) so a
    fresh checkout can produce input without any external data.
  * exit code 0 + ONE JSON summary line on stdout (machine-consumable, the
    bench.py convention); diagnostics go to stderr.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys


def _parse_set(cfg_cls, pairs: list[str]) -> dict:
    """--set name=value pairs -> typed CrawlConfig overrides."""
    fields = {f.name: f for f in dataclasses.fields(cfg_cls)}
    out: dict = {}
    for pair in pairs:
        name, sep, raw = pair.partition("=")
        if not sep or name not in fields:
            known = ", ".join(sorted(fields))
            raise SystemExit(
                f"--set {pair!r}: expected name=value with name one of {known}"
            )
        f = fields[name]
        ftype = f.type if isinstance(f.type, str) else getattr(f.type, "__name__", "")
        try:
            if "tuple" in ftype:
                val: object = tuple(s for s in raw.split(",") if s)
            elif "bool" in ftype:
                val = raw.lower() in ("1", "true", "yes", "on")
            elif "float" in ftype:
                val = float(raw)
            elif "int" in ftype:
                # int | None fields accept 'none'
                val = None if raw.lower() == "none" else int(raw)
            else:
                val = raw
        except ValueError:
            raise SystemExit(
                f"--set {pair!r}: {name} expects a value of type {ftype!r}"
            )
        out[name] = val
    return out


def _cmd_crawl(args) -> int:
    import ray

    from scrapy__ray.config import CrawlConfig
    from scrapy__ray.engine import crawl

    overrides = _parse_set(CrawlConfig, args.set or [])
    if args.max_pages is not None:
        overrides["max_pages"] = args.max_pages
    if args.max_rounds is not None:
        overrides["max_rounds"] = args.max_rounds
    if args.dedup:
        overrides["dedup"] = args.dedup
    cfg = CrawlConfig(**overrides)

    owns_ray = not ray.is_initialized()
    if owns_ray:
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            include_dashboard=False,
            logging_level="ERROR",
        )
    try:
        summary = crawl(args.corpus, args.out, cfg=cfg, resume=args.resume)
        print(
            json.dumps(
                {
                    "rounds": summary.rounds,
                    "fetched": summary.total_fetched,
                    "urls_per_sec": summary.urls_per_sec,
                    "wall_s": summary.wall_s,
                    "out_dir": summary.out_dir,
                    "totals": summary.totals,
                }
            )
        )
    finally:
        if owns_ray:
            ray.shutdown()
    return 0


def _cmd_gen(args) -> int:
    import fixtures.gen as fxgen

    out = fxgen.generate(
        args.scale, args.dir or fxgen.default_dir(args.scale), force=args.force
    )
    print(json.dumps({"corpus": out, "scale": args.scale}))
    return 0


def _cmd_mirror(args) -> int:
    from scrapy__ray.sources.fsdir import build_fsdir_corpus

    out = build_fsdir_corpus(args.root, args.out)
    import pyarrow.parquet as pq

    hosts = pq.read_metadata(os.path.join(out, "hosts.parquet")).num_rows
    print(json.dumps({"corpus": out, "hosts": hosts, "root": args.root}))
    return 0


def _cmd_mimic(args) -> int:
    import ray

    from scrapy__ray import mimic

    owns_ray = not ray.is_initialized()
    if owns_ray:
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            include_dashboard=False,
            logging_level="ERROR",
        )
    try:
        only = args.only.split(",") if args.only else None
        records = mimic.run_sweep(args.sf, only=only)
        if args.out:
            mimic.write_report(args.out, args.sf, records)
        summary = mimic.summarize(records)
        print(json.dumps({"sf_dir": args.sf, **summary}))
    finally:
        if owns_ray:
            ray.shutdown()
    return 0 if summary["green"] == summary["total"] else 1


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="python -m scrapy__ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("crawl", help="run a crawl over a fixture corpus")
    c.add_argument("--corpus", required=True, help="corpus dir (see `gen`)")
    c.add_argument("--out", required=True, help="output/checkpoint dir")
    c.add_argument("--resume", action="store_true", help="resume from checkpoint")
    c.add_argument("--max-pages", type=int, default=None)
    c.add_argument("--max-rounds", type=int, default=None)
    c.add_argument("--dedup", choices=("exact", "cuckoo"), default=None)
    c.add_argument(
        "--set",
        action="append",
        metavar="NAME=VALUE",
        help="override any CrawlConfig field (the scrapy -s analogue)",
    )
    c.set_defaults(fn=_cmd_crawl)

    g = sub.add_parser("gen", help="materialize a deterministic fixture corpus")
    g.add_argument("--scale", required=True, help="sf-small|sf-mid|sf-large|sf-bench|sf-scale|sf-gzip")
    g.add_argument("--dir", default=None, help="target dir (default: cache path)")
    g.add_argument("--force", action="store_true")
    g.set_defaults(fn=_cmd_gen)

    m = sub.add_parser(
        "mirror",
        help="build a file:// corpus from a wget-style on-disk mirror "
        "(one lowercase directory per host); crawl it with `crawl --corpus`",
    )
    m.add_argument("--root", required=True, help="mirror root directory")
    m.add_argument("--out", required=True, help="corpus (metadata) output dir")
    m.set_defaults(fn=_cmd_mirror)

    mm = sub.add_parser(
        "mimic",
        help="full driver-mimic correctness sweep: every queries() entry vs "
        "its oracle_sql() with the driver's comparator (rows/schema/hash)",
    )
    mm.add_argument("--sf", default="/root/testdata/sf0.01", help="sf table dir")
    mm.add_argument("--out", default=None, help="write MIMIC_r{N}.json here")
    mm.add_argument("--only", default=None, help="comma-separated query names")
    mm.set_defaults(fn=_cmd_mimic)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
