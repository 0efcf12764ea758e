"""Run any registry query from the command line:

    python -m changegen_spark.queries q01_pricing_summary
    python -m changegen_spark.queries q_lsh_pairs --sf-dir /root/testdata/sf0.1
    python -m changegen_spark.queries q_distance_join --explain
    python -m changegen_spark.queries --list

The registry (``all_queries()``) is the engine's user-facing query
surface; this entry point makes every operator runnable without writing a
script — show results, count, or dump the formatted physical plan.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="python -m changegen_spark.queries",
        description="Run a registry query against a parquet table directory.",
    )
    p.add_argument("name", nargs="?", help="query name (see --list)")
    p.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
        help="table directory (default $SPARK_GRAFT_SF_DIR or sf0.01)",
    )
    p.add_argument("--list", action="store_true", help="list query names")
    p.add_argument("--explain", action="store_true", help="print the formatted physical plan instead of rows")
    p.add_argument("--count", action="store_true", help="print only the row count")
    p.add_argument("--limit", type=int, default=20, help="rows to show (default 20)")
    p.add_argument("--oracle", action="store_true", help="print the query's DuckDB oracle SQL and exit (no Spark)")
    args = p.parse_args(argv)

    from changegen_spark.queries import all_oracles, all_queries

    if args.list:
        oracles = all_oracles()
        for n in all_queries():
            print(f"{n}{'' if n in oracles else '  [rows-only]'}")
        return 0
    if not args.name:
        p.error("query name required (or --list)")
    qs = all_queries()
    if args.name not in qs:
        print(f"unknown query {args.name!r}; try --list", file=sys.stderr)
        return 2
    if args.oracle:
        sql = all_oracles().get(args.name)
        if sql is None:
            print(f"{args.name} is rows-only (no oracle SQL)", file=sys.stderr)
            return 1
        print(sql.strip())
        return 0

    from changegen_spark.session import get_spark

    spark = get_spark("changegen_spark-query")
    df = qs[args.name](spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
        return 0
    if args.count:
        print(df.count())
        return 0
    df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    try:
        raise SystemExit(main())
    except BrokenPipeError:  # `… | head` closed the pipe — not an error
        os.dup2(os.open(os.devnull, os.O_WRONLY), sys.stdout.fileno())
        raise SystemExit(0)
