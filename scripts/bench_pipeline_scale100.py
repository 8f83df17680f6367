"""100x scale measurement for the §2.A pipeline layer (round-7 follow-on
to the text-operator 100x table; results: PERFORMANCE.md "Measured
scale-up: 100x"): LS_State snapshot (q111) and the realized-PnL engine
(q112) over a 100x orders+lineitem replica — ~15M contracts and ~60M
ledger rows' worth of lease events at sf0.1 x 100 — under the same
24 GiB driver clamp.

Replication shifts ALL entity keys per replica by r x 10M (o_orderkey /
l_orderkey = contract ids, o_custkey = address ids) so contract and
address cardinality scale with the data instead of multiplying event
depth per contract (which would measure a pathological ledger, not a
bigger one). Timestamps are left unchanged: each snapshot window sees
100x the contracts, the production axis of growth.

Run from the repo root: ``python scripts/bench_pipeline_scale100.py``.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pyspark.sql.functions as F  # noqa: E402

from _benchutil import measure  # noqa: E402
from extract_transform_load_spark.session import get_spark  # noqa: E402

REPLICA_PATH = "/tmp/pipeline100x"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SHIFT = 10_000_000
QUERIES = ["q111_ls_state_snapshot", "q112_realized_pnl"]


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def build_replica(spark, load) -> None:
    """Build from load() output (NOT raw spark.read.parquet): load
    normalizes driver-round timestamp quirks (NANOS->long, NTZ casts),
    so the replica and the 1x leg run identically-typed plans."""
    for table, keys in (
        ("orders", ["o_orderkey", "o_custkey"]),
        ("lineitem", ["l_orderkey"]),
    ):
        dst = f"{REPLICA_PATH}/{table}.parquet"
        if os.path.exists(dst):
            continue
        base = load(spark, SF_DIR, table)
        for batch in range(10):
            parts = []
            for i in range(10):
                r = batch * 10 + i
                d = base
                for k in keys:
                    d = d.withColumn(k, F.col(k) + F.lit(r * SHIFT))
                parts.append(d)
            big = parts[0]
            for p in parts[1:]:
                big = big.unionByName(p)
            big.repartition(32).write.mode(
                "overwrite" if batch == 0 else "append"
            ).parquet(dst)


def main() -> None:
    import extract_transform_load_spark.plans.domain as dom

    spark = get_spark(extra_conf={"spark.ui.enabled": "true"})  # REST metrics
    spark.sparkContext.setLogLevel("ERROR")
    orig = dom.load
    t0 = time.time()
    build_replica(spark, orig)
    # validate EVERY replicated table (a crashed prior build can leave
    # one table partial while the other is complete)
    for table in ("orders", "lineitem"):
        nb = orig(spark, SF_DIR, table).count()
        nr = spark.read.parquet(f"{REPLICA_PATH}/{table}.parquet").count()
        print(f"{table} 1x={nb} 100x={nr}")
        if nr != 100 * nb:
            raise SystemExit(
                f"replica {table} holds {nr} rows, expected {100 * nb}"
                " - delete the directory and rerun"
            )
    n1 = orig(spark, SF_DIR, "lineitem").count()
    print(f"replica build/load {time.time() - t0:.0f}s")

    def run(qname: str, sf_dir: str) -> None:
        noop(getattr(dom, qname)(spark, sf_dir))

    results = {}
    for qname in QUERIES:
        run(qname, SF_DIR)  # warm codegen
        row = {}
        for label, sf_dir in (("1x", SF_DIR), ("100x", REPLICA_PATH)):
            try:
                if label == "100x":
                    # only orders/lineitem are replicated; other tables
                    # (region etc) are not used by these queries. Route
                    # through the real load (same normalization layer).
                    dom.load = lambda s_, d_, t_: orig(s_, REPLICA_PATH, t_)
                row[label] = measure(spark, lambda: run(qname, sf_dir))
            finally:
                dom.load = orig
        row["ratio"] = round(row["100x"]["wall_s"] / row["1x"]["wall_s"], 1)
        results[qname] = row
        print(f"{qname}: {json.dumps(row)}", flush=True)
    print(json.dumps({"sf_dir": SF_DIR, "lineitem_1x": n1, "results": results}))


if __name__ == "__main__":
    main()
