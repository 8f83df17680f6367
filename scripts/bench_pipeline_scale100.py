"""100x scale measurement for the §2.A pipeline layer (round-7 follow-on
to the text-operator 100x table; results: PERFORMANCE.md "Measured
scale-up: 100x"): LS_State snapshot (q111) and the realized-PnL engine
(q112) over a 100x orders+lineitem replica — ~150k contracts and ~600M
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

from _benchutil import shuffle_write_bytes  # noqa: E402
from extract_transform_load_spark.session import get_spark  # noqa: E402

REPLICA_PATH = "/tmp/pipeline100x"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SHIFT = 10_000_000
QUERIES = ["q111_ls_state_snapshot", "q112_realized_pnl"]


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def build_replica(spark) -> None:
    for table, keys in (
        ("orders", ["o_orderkey", "o_custkey"]),
        ("lineitem", ["l_orderkey"]),
    ):
        dst = f"{REPLICA_PATH}/{table}.parquet"
        if os.path.exists(dst):
            continue
        base = spark.read.parquet(f"{SF_DIR}/{table}.parquet")
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
    t0 = time.time()
    build_replica(spark)
    n1 = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    n100 = spark.read.parquet(f"{REPLICA_PATH}/lineitem.parquet").count()
    print(f"lineitem 1x={n1} 100x={n100} (replica {time.time() - t0:.0f}s)")
    if n100 != 100 * n1:  # a crashed prior build leaves a partial dir
        raise SystemExit(
            f"replica at {REPLICA_PATH} holds {n100} rows, expected {100 * n1}"
            " - delete the directory and rerun"
        )

    orig = dom.load

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
                    # (region etc) are not used by these queries
                    dom.load = lambda s_, d_, t_: s_.read.parquet(
                        f"{REPLICA_PATH}/{t_}.parquet"
                    )
                sw0 = shuffle_write_bytes(spark)
                t0 = time.time()
                run(qname, sf_dir)
                wall = time.time() - t0
                sw1 = shuffle_write_bytes(spark)
            finally:
                dom.load = orig
            row[label] = {
                "wall_s": round(wall, 2),
                "shuffle_mb": round((sw1 - sw0) / 1e6, 1)
                if sw0 >= 0 and sw1 >= 0
                else None,
            }
        row["ratio"] = round(row["100x"]["wall_s"] / row["1x"]["wall_s"], 1)
        results[qname] = row
        print(f"{qname}: {json.dumps(row)}", flush=True)
    print(json.dumps({"sf_dir": SF_DIR, "lineitem_1x": n1, "results": results}))


if __name__ == "__main__":
    main()
