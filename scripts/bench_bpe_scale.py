"""Production-shape batched-BPE measurement (round-4 verdict task 5).

Builds the 10x documents replica (vocabulary renamed per replica — the
PERFORMANCE.md construction that preserves dedup structure without hot
shingles), then trains `--n-merges` BPE merges on the DISTRIBUTED path
with `batch=--batch, exact=False` and reports rounds, wall seconds and
the rounds*batch/n_merges ratio, i.e. how close the fast selector gets
to the ideal rounds = n/batch.

    python scripts/bench_bpe_scale.py [--n-merges 2000] [--batch 256]
        [--sf-dir /root/testdata/sf0.1] [--replicas 10]

One JSON line on stdout.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F  # noqa: E402

from extract_transform_load_spark.operators import bpe  # noqa: E402
from extract_transform_load_spark.session import get_spark  # noqa: E402


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--n-merges", type=int, default=2000)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    p.add_argument("--replicas", type=int, default=10)
    p.add_argument(
        "--vocab-spread",
        type=int,
        default=199,
        help="suffix words with q<doc_id%%spread> so the distinct-word "
        "table reaches web-corpus shape (the fixture's base vocabulary "
        "is only 31 words — far too small to sustain a 2000-merge train)",
    )
    args = p.parse_args()

    spark = get_spark(app_name="bpe-scale")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")

    # 10x replica with renamed vocabulary (PERFORMANCE.md construction)
    # PLUS a per-doc vocab spread: every word gets a 'q<doc%spread>r<rep>'
    # suffix, so the distinct-word table — the thing BPE's merge loop
    # actually iterates — reaches web-corpus shape (~vocab*spread*replicas
    # words) instead of the fixture's 31-word toy alphabet.
    rep = spark.range(args.replicas).select(F.col("id").alias("rep"))
    docs10 = docs.crossJoin(rep).select(
        (F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"),
        F.expr(
            "array_join(transform(split(text, ' '), w -> IF(w = '', w, "
            f"concat(w, 'q', CAST(doc_id % {args.vocab_spread} AS STRING), "
            "'r', CAST(rep AS STRING)))), ' ')"
        ).alias("text"),
    ).localCheckpoint(eager=True)

    n_docs = docs10.count()
    n_words = (
        docs10.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .select("w")
        .distinct()
        .count()
    )

    rounds = {"n": 0}
    orig = bpe._select_batch_fast

    def spy(top, alphabet, max_accept):
        rounds["n"] += 1
        return orig(top, alphabet, max_accept)

    bpe._select_batch_fast = spy
    t0 = time.time()
    try:
        merges = bpe.learn_bpe(
            docs10,
            n_merges=args.n_merges,
            min_pair_count=2,
            collect_threshold=0,  # force the distributed path
            batch=args.batch,
            exact=False,
        )
    finally:
        bpe._select_batch_fast = orig
    wall = time.time() - t0

    print(
        json.dumps(
            {
                "metric": "bpe_scale",
                "n_docs": n_docs,
                "distinct_words": n_words,
                "n_merges_requested": args.n_merges,
                "n_merges_learned": len(merges),
                "batch": args.batch,
                "rounds": rounds["n"],
                "wall_sec": round(wall, 1),
                "merges_per_round": round(len(merges) / max(1, rounds["n"]), 1),
                "rounds_over_ideal": round(
                    rounds["n"] / max(1, -(-len(merges) // args.batch)), 2
                ),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
