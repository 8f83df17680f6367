"""100x embeddings-replica scale measurement for the semantic delta
(q133; results: PERFORMANCE.md "Measured scale-up: 100x" table).

Replica construction follows the round-3 anti-hotspot rule transposed
to vectors: vec_ids shift by r*10M AND the LABEL is suffixed per
replica — replicating labels identically would multiply every block's
size 100x and the label-blocked pair space quadratically, measuring a
pathological block, not a bigger corpus. Real growth adds blocks.

Run from the repo root:
    python scripts/bench_semantic_scale100.py
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

REPLICA_PATH = "/tmp/embeddings100x"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SHIFT = 10_000_000


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from extract_transform_load_spark.operators.curation import semantic_delta
    from extract_transform_load_spark.sources.tables import load

    spark = get_spark(extra_conf={"spark.ui.enabled": "true"})  # REST metrics
    spark.sparkContext.setLogLevel("ERROR")
    emb1 = load(spark, SF_DIR, "embeddings")
    t0 = time.time()
    if not os.path.exists(REPLICA_PATH):
        reps = emb1.crossJoin(
            F.broadcast(spark.range(100).withColumnRenamed("id", "__r"))
        ).select(
            (F.col("vec_id") + F.col("__r") * SHIFT).alias("vec_id"),
            F.concat(F.col("label"), F.lit("_r"), F.col("__r")).alias("label"),
            F.col("embedding"),
        )
        reps.repartition(32).write.mode("overwrite").parquet(REPLICA_PATH)
    emb100 = spark.read.parquet(REPLICA_PATH)
    n1, n100 = emb1.count(), emb100.count()
    print(f"vectors 1x={n1} 100x={n100} (build/load {time.time() - t0:.0f}s)")
    if n100 != 100 * n1:
        raise SystemExit(
            f"replica holds {n100} rows, expected {100 * n1} - delete and rerun"
        )

    results = {}
    for label, df in (("1x", emb1), ("100x", emb100)):
        delta = df.filter(F.col("vec_id") % 4 == 0)
        store = df.filter(F.col("vec_id") % 4 != 0)

        def run():
            noop(semantic_delta(delta, store, threshold=0.45, block_col="label"))

        run()  # warm
        runs = [measure(spark, run) for _ in range(2)]
        results[label] = min(runs, key=lambda m: m["wall_s"])
        print(f"{label}: {json.dumps(results[label])}", flush=True)
    results["ratio"] = round(results["100x"]["wall_s"] / results["1x"]["wall_s"], 1)
    print(json.dumps({"sf_dir": SF_DIR, "vectors_1x": n1, "results": results}))


if __name__ == "__main__":
    main()
