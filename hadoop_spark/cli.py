"""Command-line runner — the `hadoop jar` / `mapred streaming` analog:
every catalog query is invocable by name against any sf directory.

    python -m hadoop_spark --list
    python -m hadoop_spark wordcount --sf-dir /root/testdata/sf0.01
    python -m hadoop_spark tpch_q1 --explain
    python -m hadoop_spark dedup_minhash --out /tmp/dups.parquet

Reference parity: the reference ships job mains wired through a Driver
(`EXAMPLES/ExampleDriver.java:29` program registry); this is that
registry over `plans/catalog.py`, with --explain exposing the physical
plan the way a user tunes it.
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="hadoop_spark",
        description="Run a named catalog query on a Spark session.",
    )
    p.add_argument("query", nargs="?", help="query name (see --list)")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p.add_argument("--list", action="store_true", help="list query names")
    p.add_argument(
        "--explain", action="store_true", help="print the physical plan only"
    )
    p.add_argument(
        "--limit", type=int, default=20, help="rows to show (default 20)"
    )
    p.add_argument(
        "--out", default=None, help="write full result as parquet here"
    )
    return p


def main(argv: list[str] | None = None) -> int:
    from hadoop_spark.plans import QUERIES, load_all

    args = build_parser().parse_args(argv)
    load_all()
    if args.list or not args.query:
        for name in QUERIES:
            print(name)
        return 0
    if args.query not in QUERIES:
        print(f"unknown query: {args.query} (try --list)", file=sys.stderr)
        return 2

    from hadoop_spark.session import get_session

    spark = get_session(app_name=f"hadoop_spark:{args.query}")
    df = QUERIES[args.query](spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
        return 0
    if args.out:
        df.write.mode("overwrite").parquet(args.out)
        print(f"wrote {args.out}")
        return 0
    df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
