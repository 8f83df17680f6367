"""100x documents-replica scale measurement for the headline text
operators (VERDICT r06 ranked task 5; results: PERFORMANCE.md "Measured
scale-up: 100x" table). Extends scripts/bench_datapipe_scale.py's 10x
protocol two decades up: ~500k docs (sf0.1 x 100) under the same 24 GiB
driver clamp the 10x runs used.

Replica construction matches the 10x script (and the round-3 lesson):
ids shifted per replica and the VOCABULARY renamed per replica (every
word suffixed ``r{N}``) — interleaving a tag token instead creates
degenerate hot shingles that measure the guard rails, not the operator.

Per query this records wall seconds AND shuffle-write bytes (the Spark
UI REST API's per-stage ``shuffleWriteBytes``, summed over the stages
the query ran — the number that becomes the network bill on a real
cluster). Run from the repo root:

    python scripts/bench_datapipe_scale100.py [--queries q42,q128]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _benchutil import measure  # noqa: E402

import pyspark.sql.functions as F  # noqa: E402

from extract_transform_load_spark.session import get_spark  # noqa: E402

REPLICA_PATH = "/tmp/docs100x_datapipe"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
QUERIES = [
    "q42_minhash_lsh_pairs",
    "q61_dedup_clusters",
    "q101_paragraph_dedup",
    "q122_repetition_metrics",
    "q127_gram_cardinality_hll",
    "q128_cross_doc_spans",
    # round 8: the production clustering composition and the curation
    # capstone + delta (PERFORMANCE.md 100x table rows recorded
    # 2026-08-15)
    "q130_dedup_clusters_minhash",
    "q131_curation_pipeline",
    "q132_curation_delta",
    # round 8, second leg: model-based quality filtering over documents
    # (q135 hard negatives is embeddings-side and out of this docs
    # replica's scope; its physical plan is q44's, whose scale path is
    # the IVF/PQ candidate generators)
    "q134_quality_classifier",
    "q136_bigram_lm_score",
    "q137_curation_model_pipeline",
    "q138_tf_cosine_pairs",
    # round 8, third leg: the per-source contribution cap (one
    # WindowGroupLimit shuffle on source; graph/linkage live in
    # bench_graph_linkage_scale100.py — their tables aren't documents)
    "q141_source_caps",
]


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def build_replica(spark, docs):
    if not os.path.exists(REPLICA_PATH):
        # 100 replicas in one plan would blow the union depth; write in
        # 10 batches of 10 (each batch reuses the 10x construction).
        for batch in range(10):
            parts = []
            for i in range(10):
                r = batch * 10 + i
                suff = f"r{r}"
                d = docs.withColumn(
                    "doc_id", F.col("doc_id") + F.lit(r * 10_000_000)
                )
                if r:
                    d = d.withColumn(
                        "text",
                        F.array_join(
                            F.transform(
                                F.split("text", " "),
                                lambda w: F.concat(w, F.lit(suff)),
                            ),
                            " ",
                        ),
                    )
                parts.append(d)
            big = parts[0]
            for p in parts[1:]:
                big = big.unionByName(p)
            big.repartition(32).write.mode(
                "overwrite" if batch == 0 else "append"
            ).parquet(REPLICA_PATH)
    return spark.read.parquet(REPLICA_PATH)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=",".join(QUERIES))
    args = ap.parse_args()

    import extract_transform_load_spark.plans.datapipe as dp

    spark = get_spark(extra_conf={"spark.ui.enabled": "true"})  # REST metrics
    spark.sparkContext.setLogLevel("ERROR")
    docs1 = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    t0 = time.time()
    docs100 = build_replica(spark, docs1)
    n1, n100 = docs1.count(), docs100.count()
    print(f"docs 1x={n1} 100x={n100} (replica build/load {time.time() - t0:.0f}s)")
    if n100 != 100 * n1:  # a crashed prior build leaves a partial dir
        raise SystemExit(
            f"replica at {REPLICA_PATH} holds {n100} rows, expected {100 * n1} "
            "- delete the directory and rerun (refusing to mislabel a "
            "partial replica as 100x)"
        )

    def run(qname: str, df) -> None:
        qfn = getattr(dp, qname)
        orig = dp.load
        try:
            dp.load = lambda s_, sf_, n_: df
            noop(qfn(spark, "replica"))
        finally:
            dp.load = orig

    results = {}
    for qname in args.queries.split(","):
        run(qname, docs1.limit(100))  # warm codegen
        row = {}
        for label, df in (("1x", docs1), ("100x", docs100)):
            row[label] = measure(spark, lambda: run(qname, df))
        row["ratio"] = round(row["100x"]["wall_s"] / row["1x"]["wall_s"], 1)
        results[qname] = row
        print(f"{qname}: {json.dumps(row)}", flush=True)
    print(json.dumps({"sf_dir": SF_DIR, "docs_1x": n1, "docs_100x": n100,
                      "results": results}))


if __name__ == "__main__":
    main()
