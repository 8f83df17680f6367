"""q117 marginal-cost measurement (results: PERFORMANCE.md
"Measured: roll-forward cost is flat as history deepens").

Run from the repo root: ``python scripts/bench_incremental_history.py``.

q117 marginal-cost measurement, production shape: event history grows
10x (closed leases deep in the past, date-partitioned silver tables);
the hourly round = roll-forward from the STORED T1 snapshot. Claim under
test: incremental cost is O(delta + open set) — flat as history grows —
while full recompute is O(history)."""
import os
import sys
import time

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from extract_transform_load_spark.session import get_spark
import pyspark.sql.functions as F
from extract_transform_load_spark.plans.domain import lease_opening, lease_events, T1, T2
from extract_transform_load_spark.pipeline.snapshots import ls_state_snapshot, ls_state_incremental

spark = get_spark()
sf = "/root/testdata/sf0.1"
SHIFT_ID = 10_000_000

def noop(df):
    df.write.format("noop").mode("overwrite").save()

opening1 = lease_opening(spark, sf)
repay1, cp1, liq1, cls1 = lease_events(spark, sf)

def past(df, r):
    """Replica r: ids shifted, timestamps pushed back r*10 years."""
    out = df.withColumn("LS_contract_id", F.col("LS_contract_id") + F.lit(r * SHIFT_ID))
    return out.withColumn("LS_timestamp", F.col("LS_timestamp") - F.expr(f"INTERVAL {r*120} MONTHS"))

def hist(k):
    """1x live data + (k-1) replicas of CLOSED history deep in the past."""
    op, rp, c2, lq, cl = opening1, repay1, cp1, liq1, cls1
    ops, rps, cps, lqs, cls_ = [op], [rp], [c2], [lq], [cl]
    for r in range(1, k):
        ops.append(past(opening1, r))
        rps.append(past(repay1, r))
        cps.append(past(cp1, r))
        lqs.append(past(liq1, r))
        # close EVERY replica contract 60 days after its (shifted) opening
        cls_.append(
            past(opening1, r).select(
                "LS_contract_id",
                (F.col("LS_timestamp") + F.expr("INTERVAL 60 DAYS")).alias("LS_timestamp"),
            )
        )
    import functools
    u = lambda fs: functools.reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), fs)
    return u(ops), u(rps), u(cps), u(lqs), u(cls_)

def write_partitioned(df, path):
    (df.withColumn("event_date", F.to_date("LS_timestamp"))
       .write.mode("overwrite").partitionBy("event_date").parquet(path))
    return spark.read.parquet(path)

for k in (1, 10):
    base = f"/tmp/hist_{k}x"
    op, rp, c2, lq, cl = hist(k)
    op = write_partitioned(op, base + "/opening")
    rp = write_partitioned(rp, base + "/repay")
    c2 = write_partitioned(c2, base + "/cp")
    lq = write_partitioned(lq, base + "/liq")
    cl = write_partitioned(cl, base + "/cls")
    prev = ls_state_snapshot(op, rp, c2, lq, cl, T1)
    prev.write.mode("overwrite").parquet(base + "/prev_state")
    prev = spark.read.parquet(base + "/prev_state")
    print(f"k={k} events={rp.count()+c2.count()+lq.count()} open_at_T1={prev.count()}")
    noop(ls_state_incremental(prev, op, rp, c2, lq, cl, T1, T2).limit(10))  # warm
    ts = []
    for _ in range(2):
        t0 = time.time(); noop(ls_state_incremental(prev, op, rp, c2, lq, cl, T1, T2)); ts.append(time.time()-t0)
    t_incr = min(ts)
    ts = []
    for _ in range(2):
        t0 = time.time(); noop(ls_state_snapshot(op, rp, c2, lq, cl, T2)); ts.append(time.time()-t0)
    t_full = min(ts)
    print(f"k={k}: incremental_from_stored={t_incr:.2f}s full_recompute={t_full:.2f}s speedup={t_full/t_incr:.1f}x")
