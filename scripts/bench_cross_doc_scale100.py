"""100x decision measurement for cross_doc_spans' shared candidate-text
cache (VERDICT r11 ranked task 5's "Done" evidence): the candidate-text
frame feeds two differently-aliased joins, so without sharing the corpus
scan + semi-join runs once PER SIDE. The r12 persist bounds its cache at
the CANDIDATE text (df-cut near-dup docs). This script measures both
settings at ~100x the sf0.01 corpus on the two regimes that matter:

- ``low_dup``: mostly-unique corpus, few duplicate pairs — the realistic
  warehouse shape; the cache is a tiny fraction of the corpus and the
  persist saves one full corpus read + semi-join.
- ``all_dup``: EVERY doc is a candidate (the thinning fixture's shape) —
  the adversarial regime where the cache is the whole corpus text;
  MEMORY_AND_DISK must degrade to "materialize once, read twice" and not
  lose to "compute twice".

Both settings must return identical spans (asserted). Corpora are
written to parquet first so the re-scan cost is the real columnar read,
not an in-memory replay. Run back-to-back in one session:
``python scripts/bench_cross_doc_scale100.py``.
"""

from __future__ import annotations

import json
import os
import random
import sys
import tempfile
import time

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from extract_transform_load_spark.session import get_spark  # noqa: E402


def _words(rng, tag: str, n: int) -> str:
    return " ".join(f"{tag}{rng.randrange(10**9)}" for _ in range(n))


def build_low_dup(spark, n_docs: int = 50_000, dup_pairs: int = 250,
                  doc_len: int = 1200, seed: int = 7):
    """Unique docs + a small planted dup-pair population (~1%)."""
    rng = random.Random(seed)
    rows = []
    for i in range(n_docs):
        rows.append((i, _words(rng, f"u{i}_", doc_len // 10)[:doc_len]))
    nid = n_docs
    for p in range(dup_pairs):
        shared = _words(rng, f"s{p}_", 60)[:600]
        a = _words(rng, f"x{p}_", 60)[:600] + " " + shared
        b = shared + " " + _words(rng, f"y{p}_", 60)[:600]
        rows.append((nid, a))
        rows.append((nid + 1, b))
        nid += 2
    return spark.createDataFrame(rows, "doc_id long, text string").repartition(32)


def build_all_dup(spark, n_pairs: int = 2_000, span_len: int = 1500,
                  pad_len: int = 1000, seed: int = 11):
    """Every doc shares a span with its pair — candidate set == corpus."""
    rng = random.Random(seed)
    rows = []
    for i in range(n_pairs):
        shared = _words(rng, f"s{i}_", span_len // 10)[:span_len]
        a = _words(rng, f"a{i}_", pad_len // 10)[:pad_len] + " " + shared
        b = shared + " " + _words(rng, f"b{i}_", pad_len // 10)[:pad_len]
        rows.append((2 * i, a))
        rows.append((2 * i + 1, b))
    return spark.createDataFrame(rows, "doc_id long, text string").repartition(32)


def main() -> None:
    from extract_transform_load_spark.operators.dedup import cross_doc_spans

    spark = get_spark(app_name="bench-cross-doc-100x")
    spark.sparkContext.setLogLevel("ERROR")
    warm = spark.createDataFrame([(0, "warm " * 40)], "doc_id long, text string")
    cross_doc_spans(warm).count()

    out = {}
    for regime, builder in (("low_dup", build_low_dup), ("all_dup", build_all_dup)):
        path = os.path.join(tempfile.gettempdir(), f"xdoc100_{regime}.parquet")
        builder(spark).write.mode("overwrite").parquet(path)
        docs = spark.read.parquet(path)
        res = {}
        spans = {}
        for label, share in (("unshared", False), ("shared", True)):
            walls = []
            rows_ref: list | None = None
            for rep in range(3):
                spark.sparkContext.setJobDescription(
                    f"xdoc100:{regime}:{label}:rep{rep}"
                )
                t0 = time.perf_counter()
                rows = cross_doc_spans(
                    docs, share_candidate_text=share
                ).collect()
                walls.append(round(time.perf_counter() - t0, 3))
                rows_ref = rows
                spark.catalog.clearCache()  # each rep pays the full cost
            res[label] = walls
            spans[label] = sorted(
                (r["a_doc"], r["b_doc"], r["a_start"], r["a_end"],
                 r["b_start"], r["b_end"]) for r in rows_ref
            )
        assert spans["shared"] == spans["unshared"], "outputs diverged"
        out[regime] = {
            "n_spans": len(spans["shared"]),
            "unshared_walls": res["unshared"],
            "shared_walls": res["shared"],
            "unshared_best": min(res["unshared"]),
            "shared_best": min(res["shared"]),
        }
        print(json.dumps({regime: out[regime]}), flush=True)
    print(json.dumps({"result": out}))
    spark.stop()


if __name__ == "__main__":
    main()
