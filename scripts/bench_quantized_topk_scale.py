"""Scale measurement for the r11 Arrow-kernel form of
``cosine_topk_quantized`` (q63) against the JVM expression form it
replaced (the ``cosine_topk_bruteforce`` delegation over quantized
frames).

The claim to pin: the old form evaluated three interpreted higher-order
aggregates per (query x corpus-row) pair — ``aggregate``/``zip_with``
lambdas never enter whole-stage codegen, so scoring cost was
O(Q x N x dim) interpreted lambda calls and ALL Q x N scored rows flowed
into the top-k window. The kernel scores each Arrow batch with one NumPy
pass per query (int8 dots are exact integers in float64 — see
``_fold_dot`` — so results are bitwise identical, asserted on every leg)
and emits only batch-local top-k, so the window input is
O(batches x Q x k). At sf0.1 (2,000 x 64, 5 queries) the two forms are a
measured wash — fixed session overhead dominates; this harness measures
the scale axis that argument actually lives on.

Feed: synthetic, scan-free — deterministic pseudo-random int8 vectors
from ``xxhash64(id, j)``, the q160-harness pattern. Sizes env-overridable
via QT_N_SMALL / QT_N_BIG / QT_Q_SMALL / QT_Q_BIG.

Run from the repo root: ``python scripts/bench_quantized_topk_scale.py``.
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
from extract_transform_load_spark.session import get_spark  # noqa: E402

N_SMALL = int(os.environ.get("QT_N_SMALL", 20_000))
N_BIG = int(os.environ.get("QT_N_BIG", 200_000))
Q_SMALL = int(os.environ.get("QT_Q_SMALL", 20))
Q_BIG = int(os.environ.get("QT_Q_BIG", 50))
DIM = 64
K = 10


def feed(spark, n: int, id_col: str):
    """n deterministic pseudo-random int8 vectors (never all-zero: the
    replaced JVM form ABORTS on zero norms under ANSI, and a real
    quantized store has no zero embeddings)."""
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda j: (F.pmod(F.xxhash64(F.col("id"), j), F.lit(255)) - 127).cast(
            "tinyint"
        ),
    )
    # force element 0 nonzero so no vector can be all-zero
    vec = F.concat(
        F.array(
            F.when(F.element_at(vec, 1) == 0, F.lit(1).cast("tinyint")).otherwise(
                F.element_at(vec, 1)
            )
        ),
        F.slice(vec, 2, DIM - 1),
    )
    return spark.range(n).select(F.col("id").alias(id_col), vec.alias("embedding_q"))


def main() -> None:
    from extract_transform_load_spark.operators.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_quantized,
    )

    spark = get_spark(extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    for label, n, q in (("1x", N_SMALL, Q_SMALL), (f"{N_BIG // N_SMALL}x", N_BIG, Q_BIG)):
        corpus = feed(spark, n, "vec_id")
        queries = feed(spark, q, "query_id")
        legs = {
            "jvm_expression_form": lambda: cosine_topk_bruteforce(
                corpus, queries, k=K, vec_col="embedding_q"
            ),
            "arrow_kernel_form": lambda: cosine_topk_quantized(corpus, queries, k=K),
        }
        outs = {}
        for leg, build in legs.items():
            spark.sparkContext.setJobDescription(f"quantized-topk {label} {leg}")
            # bench.py methodology: one warm-up (JIT/codegen/worker
            # spin-up), then best-of-3 noop-sink reps
            build().write.format("noop").mode("overwrite").save()
            ms = [
                measure(
                    spark,
                    lambda: build().write.format("noop").mode("overwrite").save(),
                )
                for _ in range(3)
            ]
            best = min(ms, key=lambda m: m["wall_s"])
            best["reps"] = [m["wall_s"] for m in ms]
            results[f"{label}_{leg}"] = best | {"n": n, "q": q}
            outs[leg] = build()
            print(label, leg, json.dumps(results[f"{label}_{leg}"]), flush=True)
        a = sorted(map(tuple, outs["jvm_expression_form"].collect()))
        b = sorted(map(tuple, outs["arrow_kernel_form"].collect()))
        assert a == b, f"{label}: forms diverge"
        print(label, "forms equal on", len(a), "rows", flush=True)
    print(json.dumps(results, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
