"""10x documents-replica scale measurement for the round-5 text
operators (results: PERFORMANCE.md "Measured scale-up" table rows for
q122/q123/q124/q125).

Replica construction follows the table's preamble: ids shifted per
replica and the VOCABULARY renamed per replica (every word suffixed
``r{N}``) — interleaving a tag token instead creates degenerate hot
shingles (see the cautionary note in PERFORMANCE.md). Run from the repo
root: ``python scripts/bench_datapipe_scale.py``.
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from extract_transform_load_spark.session import get_spark  # noqa: E402

REPLICA_PATH = "/tmp/docs10x_datapipe"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def build_replica(spark, docs):
    if not os.path.exists(REPLICA_PATH):
        parts = []
        for r in range(10):
            suff = f"r{r}"
            d = docs.withColumn("doc_id", F.col("doc_id") + F.lit(r * 10_000_000))
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
        big.repartition(32).write.mode("overwrite").parquet(REPLICA_PATH)
    return spark.read.parquet(REPLICA_PATH)


def main() -> None:
    import extract_transform_load_spark.plans.datapipe as dp

    spark = get_spark()
    docs1 = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs10 = build_replica(spark, docs1)
    print(f"docs 1x={docs1.count()} 10x={docs10.count()}")

    def run(qname: str, df) -> None:
        qfn = getattr(dp, qname)
        orig = dp.load
        try:
            dp.load = lambda s_, sf_, n_: df
            noop(qfn(spark, "replica"))
        finally:
            dp.load = orig

    for qname in (
        "q122_repetition_metrics",
        "q123_oov_rate",
        "q124_gram_cardinality",
        "q125_contamination_coverage",
        "q127_gram_cardinality_hll",
        "q128_cross_doc_spans",
    ):
        run(qname, docs1.limit(100))  # warm codegen
        walls = {}
        for label, df in (("1x", docs1), ("10x", docs10)):
            ts = []
            for _ in range(2):
                t0 = time.time()
                run(qname, df)
                ts.append(time.time() - t0)
            walls[label] = min(ts)
        print(
            f"{qname}: 1x={walls['1x']:.2f}s 10x={walls['10x']:.2f}s "
            f"ratio={walls['10x'] / walls['1x']:.1f}"
        )


if __name__ == "__main__":
    main()
