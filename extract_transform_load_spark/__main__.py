"""Command-line runner: list and execute registry queries.

    python -m extract_transform_load_spark list [--grep PATTERN]
    python -m extract_transform_load_spark run QUERY [--data DIR]
        [--format csv|json|parquet|show] [--out PATH] [--limit N]
    python -m extract_transform_load_spark live WS_URL --rpc RPC_URL
        --landing DIR [--max-sessions N] [--max-wall S]
        [--reconnect-interval S] [--reconnect-jitter FRAC]
        [--propagation-delay S] [--scan-window N]

``live`` runs the supervised block-feed edge (sources/livefeed.py):
subscribe to Tendermint NewBlock over WebSocket, fetch each block's
events over HTTP JSON-RPC, land bronze parquet files under --landing
for the Spark blockfeed source to tail — with gap reconciliation AND
RPC-head tail backfill on every (re)connect. The final stdout line is
a JSON FeedStats rollup for machine consumption (per-session prose
goes to stderr). JVM-free: the edge process never starts Spark.

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

    p_live = sub.add_parser("live", help="run the supervised live block feed")
    p_live.add_argument("ws_url", help="Tendermint WS endpoint, ws[s]://host:port/websocket")
    p_live.add_argument("--rpc", required=True, help="Tendermint HTTP RPC base URL")
    p_live.add_argument("--landing", required=True, help="bronze parquet landing dir")
    p_live.add_argument("--max-sessions", type=int, default=None)
    p_live.add_argument("--max-wall", type=float, default=None,
                        help="stop reconnecting after this many seconds")
    p_live.add_argument("--reconnect-interval", type=float, default=5.0)
    p_live.add_argument("--reconnect-jitter", type=float, default=0.1,
                        help="uniform jitter fraction added to the reconnect sleep")
    p_live.add_argument("--propagation-delay", type=float, default=1.0)
    p_live.add_argument("--scan-window", type=int, default=100_000)

    p_compact = sub.add_parser(
        "compact", help="merge per-block landing files into one height-range file"
    )
    p_compact.add_argument("landing", help="bronze parquet landing dir")
    p_compact.add_argument("--min-files", type=int, default=16)
    args = p.parse_args(argv)

    if args.cmd == "compact":
        from .sources.livefeed import compact_landing

        out = compact_landing(args.landing, min_files=args.min_files)
        print(out or f"fewer than {args.min_files} block files; nothing to do")
        return 0

    if args.cmd == "live":
        from pathlib import Path

        import json as _json

        from .sources.livefeed import (
            aggregate_stats,
            http_block_fetcher,
            http_head_fetcher,
            run_supervised,
        )

        Path(args.landing).mkdir(parents=True, exist_ok=True)
        sessions = run_supervised(
            args.ws_url,
            http_block_fetcher(args.rpc),
            args.landing,
            reconnect_interval=args.reconnect_interval,
            reconnect_jitter=args.reconnect_jitter,
            max_sessions=args.max_sessions,
            max_wall=args.max_wall,
            scan_window=args.scan_window,
            propagation_delay=args.propagation_delay,
            fetch_head=http_head_fetcher(args.rpc),
        )
        for i, st in enumerate(sessions):
            print(
                f"session {i}: delivered={len(st.delivered)} "
                f"skipped={len(st.skipped)} aborted={st.aborted} error={st.error}",
                file=sys.stderr,
            )
        # final stdout line is the machine-consumable rollup
        print(_json.dumps(aggregate_stats(sessions)))
        return 1 if sessions and sessions[-1].aborted else 0

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
