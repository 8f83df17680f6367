"""Growing-DELTA axis for the semantic-delta prefilter path (round 11;
VERDICT r10 ranked task 6 — the complement of
bench_prefilter_scale100.py, which fixed the delta at 500 rows and grew
the store 100x). Here the STORE is fixed at the 100x replica
(~200k vectors) and the batch grows 1x/10x/100x (500 / 5,000 / 50,000
rows), pinning the advertised O(batch + collisions) cost shape of the
LSH path: wall and shuffle bytes should grow ~linearly with the batch,
never quadratically.

The IVF leg is measured TWO ways, deliberately:

- ``ivf_fixed`` keeps 16 cells at every batch size. With cells fixed,
  the WITHIN-BATCH candidate self-join grows quadratically per cell
  (50k rows / 16 cells -> ~3k-row cells -> millions of in-cell pairs)
  — the honest negative result a production caller needs: a fixed
  coarse quantizer is NOT batch-scalable. It runs at 1x/10x only; the
  100x leg would just burn minutes proving the same point.
- ``ivf_scaled`` scales cells with the batch (16 / 64 / 256 — the
  sqrt-ish deployment guidance), holding per-cell occupancy roughly
  constant; this is the configuration whose cost shape should match
  the LSH leg's.

Delta vectors come from the replica itself (vec_id % 4 == 0 slices of
the first 1/10/100 replicas), so bigger batches are dup-HEAVY —
~25 copies of each organic vector at 100x — which is the adversarial
case for candidate growth: identical vectors collide in every band and
every cell by construction.

Run from the repo root: ``python scripts/bench_prefilter_delta_growth.py``
(builds the replica via bench_semantic_scale100 if missing).
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

    # store: FIXED on every leg — every replica vector outside the %4
    # batch slice (~150k rows)
    store = emb100.filter(F.col("vec_id") % 4 != 0).select("vec_id", "embedding")
    print(f"store(fixed)={store.count()} rows", flush=True)

    # growing delta: %4 == 0 rows of the first n replicas
    def delta_of(n_replicas: int):
        return emb100.filter(
            (F.col("vec_id") % 4 == 0) & (F.col("vec_id") < n_replicas * SHIFT)
        ).select("vec_id", "embedding")

    legs = {
        "lsh": lambda n: dict(prefilter="lsh", dim=DIM),
        "ivf_fixed": lambda n: dict(
            prefilter="ivf", dim=DIM, ivf_centroids=16, ivf_probe=2
        ),
        "ivf_scaled": lambda n: dict(
            prefilter="ivf", dim=DIM,
            ivf_centroids={1: 16, 10: 64, 100: 256}[n],
            ivf_probe=2,
        ),
    }
    sizes = {"lsh": (1, 10, 100), "ivf_fixed": (1, 10), "ivf_scaled": (1, 10, 100)}
    results = {}
    for leg, kw_of in legs.items():
        row = {}
        for n in sizes[leg]:
            delta = delta_of(n)
            n_delta = delta.count()

            def run():
                noop(
                    semantic_delta(
                        delta, store, threshold=0.45, **kw_of(n)
                    )
                )

            run()  # warm
            runs = [measure(spark, run) for _ in range(2)]
            best = min(runs, key=lambda m: m["wall_s"])
            best["n_delta"] = n_delta
            row[f"{n}x"] = best
        base = row["1x"]["wall_s"]
        row["ratios"] = {
            k: round(v["wall_s"] / base, 1)
            for k, v in row.items()
            if k.endswith("x")
        }
        results[leg] = row
        print(f"{leg}: {json.dumps(row)}", flush=True)
    print(json.dumps({"sf_dir": SF_DIR, "store_fixed": True, "results": results}))


if __name__ == "__main__":
    main()
