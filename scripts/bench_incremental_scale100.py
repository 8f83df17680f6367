"""100x-history measurement for the incremental snapshot path (round-7
verdict ranked task 4; results: PERFORMANCE.md "Measured scale-up:
100x" pipeline table). The 10x protocol (bench_incremental_history.py)
showed roll-forward cost flat as CLOSED history deepens; this runs the
same claim at 100x history — ~60M ledger-event rows, the same scale as
the q111/q112 full-recompute rows — and records shuffle-write bytes.

Protocol deltas vs the 10x script, both deliberate:

- **One deep-past band instead of per-replica shifts.** Shifting
  replica r by r*120 months makes date ranges disjoint, so 100 replicas
  would create ~240k event_date partition directories (2,405 fixture
  dates x 100) — a local-FS listing artifact, not a measurement. All
  history replicas here shift by the SAME 120 months (contract ids stay
  disjoint via r*10M), so the partition COUNT stays fixture-shaped and
  partition SIZE carries the growth — the realistic warehouse shape,
  and the pruning claim under test is unchanged: the incremental read
  must skip the deep-past partitions entirely whatever their size.
- **Replica construction via one broadcast range cross-join** instead
  of a 100-way union (same rows, one plan; the union-depth batching the
  other 100x scripts need exists because their replicas differ per r).

Run from the repo root:
    python scripts/bench_incremental_scale100.py [--ks 1,100]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pyspark.sql.functions as F  # noqa: E402

from _benchutil import measure  # noqa: E402
from extract_transform_load_spark.session import get_spark  # noqa: E402

BASE = "/tmp/hist_scale100"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SHIFT_ID = 10_000_000
PAST = "INTERVAL 120 MONTHS"


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def deep_past(spark, df, k):
    """(k-1) id-disjoint copies of ``df``, all pushed 120 months back."""
    reps = df.crossJoin(F.broadcast(
        spark.range(1, k).withColumnRenamed("id", "__r")
    ))
    return (
        reps.withColumn("LS_contract_id", F.col("LS_contract_id") + F.col("__r") * SHIFT_ID)
        .withColumn("LS_timestamp", F.col("LS_timestamp") - F.expr(PAST))
        .drop("__r")
    )


def write_partitioned(spark, df, path):
    (
        df.withColumn("event_date", F.to_date("LS_timestamp"))
        .repartition("event_date")  # one writer per partition dir
        .write.mode("overwrite").partitionBy("event_date").parquet(path)
    )
    return spark.read.parquet(path)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ks", default="1,100")
    ap.add_argument("--rebuild", action="store_true")
    args = ap.parse_args()

    from extract_transform_load_spark.plans.domain import (
        T1,
        T2,
        lease_events,
        lease_opening,
    )
    from extract_transform_load_spark.pipeline.snapshots import (
        ls_state_incremental,
        ls_state_snapshot,
    )

    spark = get_spark(extra_conf={"spark.ui.enabled": "true"})  # REST metrics
    spark.sparkContext.setLogLevel("ERROR")
    opening1 = lease_opening(spark, SF_DIR)
    repay1, cp1, liq1, cls1 = lease_events(spark, SF_DIR)

    results = {}
    for k in (int(x) for x in args.ks.split(",")):
        base = f"{BASE}/{k}x"
        if args.rebuild and os.path.exists(base):
            shutil.rmtree(base)
        t0 = time.time()
        frames = {}
        for name, live in (
            ("opening", opening1), ("repay", repay1), ("cp", cp1),
            ("liq", liq1), ("cls", cls1),
        ):
            path = f"{base}/{name}"
            if not os.path.exists(path):
                df = live
                if k > 1:
                    if name == "cls":
                        # close EVERY replica contract 60 days after its
                        # (shifted) opening — history must be fully
                        # closed before T1 or it isn't history
                        hist = deep_past(spark, opening1, k).select(
                            "LS_contract_id",
                            (F.col("LS_timestamp") + F.expr("INTERVAL 60 DAYS")).alias(
                                "LS_timestamp"
                            ),
                        )
                    else:
                        hist = deep_past(spark, live, k)
                    df = live.unionByName(hist, allowMissingColumns=True)
                write_partitioned(spark, df, path)
            frames[name] = spark.read.parquet(path)
        op, rp, c2, lq, cl = (frames[n] for n in ("opening", "repay", "cp", "liq", "cls"))

        prev_path = f"{base}/prev_state"
        if not os.path.exists(prev_path):
            ls_state_snapshot(op, rp, c2, lq, cl, T1).write.mode("overwrite").parquet(
                prev_path
            )
        prev = spark.read.parquet(prev_path)
        n_events = rp.count() + c2.count() + lq.count()
        print(
            f"k={k}: events={n_events} open_at_T1={prev.count()} "
            f"(build/load {time.time() - t0:.0f}s)",
            flush=True,
        )

        noop(ls_state_incremental(prev, op, rp, c2, lq, cl, T1, T2).limit(10))  # warm
        row = {"events": n_events}
        for label, fn in (
            ("incremental", lambda: noop(
                ls_state_incremental(prev, op, rp, c2, lq, cl, T1, T2)
            )),
            ("full", lambda: noop(ls_state_snapshot(op, rp, c2, lq, cl, T2))),
        ):
            runs = [measure(spark, fn) for _ in range(2)]
            row[label] = min(runs, key=lambda m: m["wall_s"])
        row["speedup"] = round(row["full"]["wall_s"] / row["incremental"]["wall_s"], 1)
        results[str(k)] = row
        print(f"k={k}: {json.dumps(row)}", flush=True)

    print(json.dumps({"sf_dir": SF_DIR, "results": results}))


if __name__ == "__main__":
    main()
