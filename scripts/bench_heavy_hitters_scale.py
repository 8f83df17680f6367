"""Scale measurement for the two-pass exact heavy-hitter (round 11;
q160, operators/sketches.py::heavy_hitters_exact) against the naive
``groupBy(item).count().filter(...)`` derivation.

The claim to pin: the MG path's SHUFFLE is bounded by
partitions x (k+1) rows regardless of item cardinality, while the
naive path's exchange carries the full distinct-item set — the
difference that matters when the item column is tokens at 100 TB
(billions distinct), not the wall at laptop scale (Spark's partial
hash aggregate already map-side-combines the naive path well; on a
mostly-unique column the partial aggregate emits nearly every row into
the exchange).

Feed: synthetic, generated scan-free from ``spark.range`` — a 99%-mass
long tail of ~``tail_card`` distinct pseudo-random items (knuth-hash
of the row id) plus 1% of mass concentrated on 20 hot items — each holding share
5e-4, so at phi = 2e-4 the hot items are the only hitters with a 2.5x
margin; sizes via N_SMALL / N_BIG below (env-overridable). Result equality between the
two paths is asserted on every leg — the bench is also a correctness
check at a width the unit tests don't reach.

Run from the repo root: ``python scripts/bench_heavy_hitters_scale.py``.
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

N_SMALL = int(os.environ.get("HH_N_SMALL", 2_000_000))
N_BIG = int(os.environ.get("HH_N_BIG", 50_000_000))
TAIL_CARD = 1_000_003  # prime, ~1M distinct tail items
PHI = 0.0002  # 20 hot items at 1%/20 = 5e-4 mass each clear it 2.5x


def feed(spark, n: int):
    """1% of rows -> 20 hot items, 99% -> ~1M-distinct hashed tail."""
    base = spark.range(n)
    hot = (F.col("id") % 100) == 0  # 1% of rows
    # hot index from id//100, NOT id%20 — id%100==0 forces id%20==0,
    # which would collapse every hot row onto one item
    item = F.when(
        hot,
        F.concat(F.lit("hot"), ((F.col("id") / 100) % 20).cast("int").cast("string")),
    ).otherwise(
        F.concat(
            F.lit("t"),
            ((F.col("id") * 2654435761) % TAIL_CARD).cast("string"),
        )
    )
    return base.select(item.alias("w"))


def naive(df, phi: float):
    counts = df.groupBy("w").agg(F.count(F.lit(1)).alias("n_occurrences"))
    n = df.count()
    return counts.filter(
        F.col("n_occurrences").cast("double") >= F.lit(phi) * F.lit(float(n))
    ).select(
        F.col("w").alias("item"),
        F.col("n_occurrences").cast("bigint").alias("n_occurrences"),
        (F.col("n_occurrences").cast("double") / F.lit(float(n))).alias(
            "share"
        ),
    )


def main() -> None:
    from extract_transform_load_spark.operators.sketches import (
        heavy_hitters_exact,
    )

    spark = get_spark(extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    for label, n in (("1x", N_SMALL), ("25x", N_BIG)):
        df = feed(spark, n)
        legs = {
            "mg_two_pass": lambda: heavy_hitters_exact(df, "w", phi=PHI),
            "naive_groupby": lambda: naive(df, PHI),
        }
        row = {}
        outs = {}
        for leg, build in legs.items():

            def run():
                build().write.format("noop").mode("overwrite").save()

            run()  # warm
            runs = [measure(spark, run) for _ in range(2)]
            row[leg] = min(runs, key=lambda m: m["wall_s"])
            outs[leg] = {
                (r["item"], r["n_occurrences"]) for r in build().collect()
            }
        assert outs["mg_two_pass"] == outs["naive_groupby"], (
            "result divergence at " + label
        )
        row["n_rows"] = n
        row["n_hitters"] = len(outs["mg_two_pass"])
        results[label] = row
        print(f"{label}: {json.dumps(row)}", flush=True)
    print(json.dumps({"phi": PHI, "tail_card": TAIL_CARD, "results": results}))


if __name__ == "__main__":
    main()
