"""Crossover measurement for a size-dispatched cosine engine in
semantic_delta (r12; VERDICT r11 ranked task 3's "Done" evidence): the
Arrow pair-scoring stage (``similarity.arrow_pair_cos``) vs the JVM
expression fold, on the LSH-prefiltered path with the store fixed at
the 100x replica (~200k vectors) and the delta grown 500 / 5,000 /
50,000 rows (the bench_prefilter_delta_growth axes). Outputs are
asserted identical per leg.

MEASURED RESULT (2026-08-18, and the reason semantic_delta has NO auto
dispatch): the kernel loses at EVERY size — best-of-3 expr/arrow
4.70/4.65 (500), 10.6/13.3 (5k), 80.0/105.4 (50k), confirmed by a 3x
interleaved rerun of the 50k leg (78.3 vs 112.8 s). Both engines are
linear in the candidate-pair count; shipping two vectors per PAIR
across Arrow costs more than the interpreted fold at any scale. The
Arrow shape that wins is the q63 probe-batch matmul (no per-pair
traffic), not a pair-stream stage.

Run back-to-back in one session from the repo root:
``python scripts/bench_arrow_cos_crossover.py``
(builds the 100x replica via bench_semantic_scale100's path if
missing — run that script first if this one exits asking for it).
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

from bench_semantic_scale100 import REPLICA_PATH, SHIFT  # noqa: E402
from extract_transform_load_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DIM = 64


def main() -> None:
    from extract_transform_load_spark.operators.curation import semantic_delta
    from extract_transform_load_spark.sources.tables import load

    spark = get_spark(app_name="bench-arrow-cos")
    spark.sparkContext.setLogLevel("ERROR")
    emb1 = load(spark, SF_DIR, "embeddings")
    if not os.path.exists(REPLICA_PATH):
        reps = emb1.crossJoin(
            F.broadcast(spark.range(100).withColumnRenamed("id", "__r"))
        ).select(
            (F.col("vec_id") + F.col("__r") * SHIFT).alias("vec_id"),
            F.concat(F.col("label"), F.lit("_r"), F.col("__r")).alias("label"),
            F.col("embedding"),
        )
        reps.repartition(32).write.mode("overwrite").parquet(REPLICA_PATH)
    store = spark.read.parquet(REPLICA_PATH).select("vec_id", "embedding")

    out = {}
    for n_reps, label in ((1, "delta_500"), (10, "delta_5k"), (100, "delta_50k")):
        delta = (
            spark.read.parquet(REPLICA_PATH)
            .filter(
                (F.col("vec_id") % 4 == 0)
                & (F.col("vec_id") < n_reps * SHIFT)
            )
            .select((F.col("vec_id") + 7 * SHIFT * 1000).alias("vec_id"), "embedding")
        )
        delta.cache().count()
        res = {}
        rows = {}
        for engine in ("expr", "arrow"):
            walls = []
            got = None
            for rep in range(3):
                spark.sparkContext.setJobDescription(
                    f"arrowcos:{label}:{engine}:rep{rep}"
                )
                t0 = time.perf_counter()
                got = (
                    semantic_delta(
                        delta, store, threshold=0.9, prefilter="lsh",
                        dim=DIM, lsh_bits=8, lsh_bands=4,
                        cos_engine=engine,
                    )
                    .orderBy("vec_id")
                    .collect()
                )
                walls.append(round(time.perf_counter() - t0, 3))
            res[engine] = walls
            rows[engine] = [
                (r["vec_id"], r["max_store_sim"], r["stage"]) for r in got
            ]
        assert rows["expr"] == rows["arrow"], f"{label}: engines diverged"
        delta.unpersist()
        out[label] = {
            "n_delta": len(rows["expr"]),
            "expr_walls": res["expr"],
            "arrow_walls": res["arrow"],
            "expr_best": min(res["expr"]),
            "arrow_best": min(res["arrow"]),
        }
        print(json.dumps({label: out[label]}), flush=True)
    print(json.dumps({"result": out}))
    spark.stop()


if __name__ == "__main__":
    main()
