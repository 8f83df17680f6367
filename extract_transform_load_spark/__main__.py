"""Command-line runner: list and execute registry queries.

    python -m extract_transform_load_spark list [--grep PATTERN]
    python -m extract_transform_load_spark run QUERY [--data DIR]
        [--format csv|json|parquet|show] [--out PATH] [--limit N]

``run`` executes a registered query against the parquet tables in
``--data`` (default $SPARK_GRAFT_SF_DIR or /root/testdata/sf0.1) and
writes the result as CSV/JSON/parquet to ``--out``, or pretty-prints
with ``--format show`` (the default). The same registry powers the API
layer (api/endpoints.py) and the driver's correctness gate, so anything
runnable here is oracle-checked.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="extract_transform_load_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    p_list = sub.add_parser("list", help="list registered queries")
    p_list.add_argument("--grep", default=None, help="substring filter")

    p_run = sub.add_parser("run", help="run one query")
    p_run.add_argument("query", help="registry name, e.g. q01_pricing_summary")
    p_run.add_argument(
        "--data",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        help="directory of parquet tables",
    )
    p_run.add_argument(
        "--format", default="show", choices=["show", "csv", "json", "parquet"]
    )
    p_run.add_argument("--out", default=None, help="output path (non-show formats)")
    p_run.add_argument("--limit", type=int, default=20, help="rows for --format show")
    args = p.parse_args(argv)

    # importing .plans.registry executes plans/__init__.py, which
    # registers every query and applies the priority ordering
    from .plans.registry import REGISTRY

    if args.cmd == "list":
        for name, spec in REGISTRY.items():
            if args.grep and args.grep not in name:
                continue
            doc = " ".join((spec.doc or "").split())
            print(f"{name}: {doc[:110]}")
        return 0

    if args.query not in REGISTRY:
        print(f"unknown query {args.query!r}; try `list`", file=sys.stderr)
        return 2
    if args.format != "show" and not args.out:
        print("--out is required for csv/json/parquet", file=sys.stderr)
        return 2

    from .session import get_spark

    spark = get_spark(app_name=f"etl-spark:{args.query}")
    spark.sparkContext.setLogLevel("ERROR")
    # canonical form: total ORDER BY over all output columns, so two
    # exports of the same data are byte-comparable
    df = REGISTRY[args.query].canonical_fn(spark, args.data)
    if args.format == "show":
        df.show(args.limit, truncate=False)
    elif args.format == "parquet":
        df.write.mode("overwrite").parquet(args.out)
    elif args.format == "csv":
        df.coalesce(1).write.mode("overwrite").option("header", "true").csv(args.out)
    else:
        df.coalesce(1).write.mode("overwrite").json(args.out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
