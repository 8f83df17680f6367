"""100x measurement for the semantic-delta PREFILTER escalation path
(round 10; PERFORMANCE.md). The question this answers: when a fixed
1x-sized batch probes a store that grew 100x and no block column
exists, how much of the |delta| x |store| exact probe do the LSH-band /
IVF-cell prefilters avoid?

Reuses bench_semantic_scale100's embeddings replica (labels suffixed
per replica — here the label is NOT used: the unblocked path is exactly
the case the prefilter exists for). The delta is the SAME 500 vectors
on both legs (vec_id < SHIFT, %4 == 0), so the measured growth is pure
store-side cost — the incremental contract.

This row is about COST, not agreement: stage agreement between the
exact and prefiltered forms is pinned separately (q155/q157's
provable-recall oracle fixture and the prefilter-equals-exact test);
at threshold 0.45 on organic data the prefilter trades recall for
candidate bounds by design (audit via ann_recall_audit when labels
matter).

Run from the repo root: ``python scripts/bench_prefilter_scale100.py``.
"""

from __future__ import annotations

import json
import os
import sys

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pyspark.sql.functions as F  # noqa: E402

from _benchutil import measure  # noqa: E402
from bench_semantic_scale100 import REPLICA_PATH, SHIFT, noop  # noqa: E402
from extract_transform_load_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DIM = 64


def main() -> None:
    from extract_transform_load_spark.operators.curation import semantic_delta
    from extract_transform_load_spark.sources.tables import load

    spark = get_spark(extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    emb1 = load(spark, SF_DIR, "embeddings")
    if not os.path.exists(REPLICA_PATH):
        raise SystemExit(
            "run scripts/bench_semantic_scale100.py first (builds the replica)"
        )
    emb100 = spark.read.parquet(REPLICA_PATH)
    print(f"vectors 1x={emb1.count()} 100x={emb100.count()}", flush=True)

    # fixed 1x-sized batch on BOTH legs: growth below is store-side only
    delta = emb1.filter((F.col("vec_id") % 4 == 0)).select("vec_id", "embedding")

    def store_of(df):
        return df.filter(
            (F.col("vec_id") % 4 != 0) | (F.col("vec_id") >= SHIFT)
        ).select("vec_id", "embedding")

    modes = {
        "exact_unblocked": dict(),
        "prefilter_lsh": dict(prefilter="lsh", dim=DIM),
        "prefilter_ivf": dict(prefilter="ivf", dim=DIM, ivf_centroids=16, ivf_probe=2),
    }
    results = {}
    for mode, kw in modes.items():
        row = {}
        for label, df in (("1x", emb1), ("100x", emb100)):
            store = store_of(df)

            def run():
                noop(
                    semantic_delta(
                        delta, store, threshold=0.45,
                        max_unblocked_delta=10_000, **kw,
                    )
                )

            run()  # warm
            runs = [measure(spark, run) for _ in range(2)]
            row[label] = min(runs, key=lambda m: m["wall_s"])
        row["ratio"] = round(row["100x"]["wall_s"] / row["1x"]["wall_s"], 1)
        results[mode] = row
        print(f"{mode}: {json.dumps(row)}", flush=True)
    print(json.dumps({"sf_dir": SF_DIR, "results": results}))


if __name__ == "__main__":
    main()
