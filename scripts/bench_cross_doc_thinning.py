"""Measures what cross_doc_spans' same-diagonal seed thinning saves on
a LONG-SPAN fixture (VERDICT r06 ranked task 4's "Done" evidence;
results: PERFORMANCE.md "cross_doc_spans: diagonal seed thinning").

Fixture: ``n_pairs`` doc pairs, each sharing one ``span_len``-char span
embedded in otherwise-unique text (unique vocab per pair — no hot
fingerprints, so the df-cut keeps everything and the traffic is pure
seed-carry). Pre-thinning, a shared span of length L seeds ~L/w anchor
pairs on one diagonal and EACH carries both full texts through the
seed-text joins; post-thinning one seed per diagonal cluster survives.
Both settings must return identical spans (asserted here, and pinned by
tests/test_properties.py::test_cross_doc_spans_reference_property).

Run back-to-back in one session (this container's walls swing 2-5x
across sessions): ``python scripts/bench_cross_doc_thinning.py``.
"""

from __future__ import annotations

import json
import os
import random
import sys
os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _benchutil import measure  # noqa: E402

from extract_transform_load_spark.session import get_spark  # noqa: E402


def build_fixture(spark, n_pairs: int = 200, span_len: int = 3000,
                  pad_len: int = 2000, seed: int = 7):
    rng = random.Random(seed)

    def words(tag: str, n: int) -> str:
        return " ".join(f"{tag}{rng.randrange(10**9)}" for _ in range(n))

    rows = []
    for i in range(n_pairs):
        shared = words(f"s{i}_", span_len // 10)[:span_len]
        a = words(f"a{i}_", pad_len // 10)[:pad_len] + " " + shared
        b = shared + " " + words(f"b{i}_", pad_len // 10)[:pad_len]
        rows.append((2 * i, a))
        rows.append((2 * i + 1, b))
    return spark.createDataFrame(rows, "doc_id long, text string").repartition(32)


def main() -> None:
    from extract_transform_load_spark.operators.dedup import cross_doc_spans

    spark = get_spark(extra_conf={"spark.ui.enabled": "true"})  # REST metrics
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.createDataFrame([(0, "warm " * 40)], "doc_id long, text string")
    cross_doc_spans(docs).count()  # warm codegen

    fixture = build_fixture(spark)
    fixture.cache().count()

    # Two join regimes: at fixture scale the candidate text side fits
    # under the broadcast threshold, so seeds x texts never cross an
    # exchange and thinning shows up as WALL (fewer Arrow extensions);
    # at warehouse scale the text join is a shuffle join, so thinning
    # also cuts SHUFFLE BYTES — emulated here by disabling broadcast.
    out = {}
    for regime, conf in (("broadcast", None), ("shuffle_join", "-1")):
        if conf is not None:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", conf)
            spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", conf)
        spans = {}
        res = {}
        for label, thin in (("unthinned", False), ("thinned", True)):
            walls = []
            for rep in range(3):
                rows_box = []
                m = measure(
                    spark,
                    lambda: rows_box.extend(
                        cross_doc_spans(fixture, thin_seeds=thin).collect()
                    ),
                )
                walls.append(m["wall_s"])
                if rep == 0:
                    spans[label] = {tuple(r) for r in rows_box}
                    res[label] = {
                        "shuffle_mb": m["shuffle_mb"],
                        "n_spans": len(rows_box),
                    }
            res[label]["wall_s"] = min(walls)
            print(regime, label, json.dumps(res[label]), flush=True)
        assert spans["thinned"] == spans["unthinned"], "thinning changed the answer!"
        res["shuffle_reduction"] = (
            round(res["unthinned"]["shuffle_mb"] / res["thinned"]["shuffle_mb"], 1)
            if res["thinned"]["shuffle_mb"] and res["unthinned"]["shuffle_mb"]
            else None  # either side unmeasured (-1/None) -> no claim
        )
        res["wall_speedup"] = round(
            res["unthinned"]["wall_s"] / res["thinned"]["wall_s"], 1
        )
        out[regime] = res
    print(json.dumps(out))


if __name__ == "__main__":
    main()
