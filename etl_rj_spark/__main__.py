"""CLI: run any registry query against a testdata directory.

    python -m etl_rj_spark list [filter]
    python -m etl_rj_spark run <query> [--sf DIR] [--limit N] [--explain]

``run`` builds the named query on the engine session, shows up to
``--limit`` rows, and with ``--explain`` prints the formatted physical
plan instead of results.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="etl_rj_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    pl = sub.add_parser("list", help="list registry queries")
    pl.add_argument("filter", nargs="?", default="", help="substring filter")

    pr = sub.add_parser("run", help="run a registry query")
    pr.add_argument("query")
    pr.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    )
    pr.add_argument("--limit", type=int, default=20)
    pr.add_argument("--explain", action="store_true")

    args = p.parse_args(argv)

    from etl_rj_spark.analytics import REGISTRY

    if args.cmd == "list":
        for name, q in sorted(REGISTRY.items()):
            if args.filter in name or any(args.filter in t for t in q.tags):
                marks = ("bench" if q.bench else "") + ("" if q.oracle else " rows-only")
                tags = ",".join(q.tags)
                print(f"{name:40s} {tags}{(' [' + marks.strip() + ']') if marks.strip() else ''}")
        return 0

    if args.query not in REGISTRY:
        close = [n for n in sorted(REGISTRY) if args.query in n]
        print(f"unknown query {args.query!r}" + (f"; did you mean: {close}" if close else ""))
        return 2

    from etl_rj_spark.session import get_spark

    spark = get_spark(app_name=f"run-{args.query}")
    df = REGISTRY[args.query].build(spark, args.sf)
    if args.explain:
        df.explain("formatted")
    else:
        df.show(args.limit, truncate=40)
    return 0


if __name__ == "__main__":
    sys.exit(main())
