"""Assemble QUIET_BENCH_reference_round{N}.json from the freshest
BENCH_TELEMETRY_latest.json plus the launch loadavg sample and
round-over-round adjudication stats (median per-query ratio vs the
prior quiet record, worst/best movers). Usage:

    python scripts/assemble_quiet_record.py <round> <launch_loadavg_file> [note]

The launch loadavg file holds one /proc/loadavg line captured
immediately BEFORE bench.py started (bench.py's own loadavg_before is
sampled after its 32-thread warm-up, so it reflects self-load, not
tenant contention — the launch sample is the adjudicator).
"""

from __future__ import annotations

import json
import os
import statistics
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    rnd = int(sys.argv[1])
    load_file = sys.argv[2]
    note = sys.argv[3] if len(sys.argv) > 3 else ""
    tel = json.load(open(os.path.join(REPO, "BENCH_TELEMETRY_latest.json")))
    launch = [float(x) for x in open(load_file).read().split()[:3]]

    prior_path = os.path.join(
        REPO, f"QUIET_BENCH_reference_round{rnd - 1}.json"
    )
    prior = json.load(open(prior_path)) if os.path.exists(prior_path) else None
    record = {
        "metric": tel["metric"],
        "value": tel["value"],
        "unit": tel["unit"],
        "query_reps": tel["query_reps"],
        "loadavg_before": tel["loadavg_before"],
        "loadavg_after": tel["loadavg_after"],
        "layout_prep": tel.get("layout_prep", False),
        "sf": tel.get("sf"),
        "_loadavg_at_launch": launch,
        "_note": note,
    }
    if prior:
        old = {
            k: min(v)
            for k, v in prior.get("query_reps", {}).items()
        }
        # prior rounds appended same-day addenda for queries that
        # joined after the main record
        for k, v in prior.get("_r10_additions_addendum", {}).items():
            if isinstance(v, dict) and "best" in v:
                old[k] = v["best"]
        new = {k: min(v) for k, v in tel["query_reps"].items()}
        shared = sorted(set(new) & set(old))
        ratios = {k: new[k] / old[k] for k in shared}
        ranked = sorted(ratios.items(), key=lambda kv: -kv[1])
        record["_vs_prior_quiet"] = {
            "round": rnd - 1,
            "n_shared": len(shared),
            "median_ratio": round(statistics.median(ratios.values()), 3),
            "worst": [(k, round(v, 2)) for k, v in ranked[:5]],
            "best": [(k, round(v, 2)) for k, v in ranked[-5:]],
            "shared_total_new_s": round(sum(new[k] for k in shared), 2),
            "shared_total_old_s": round(sum(old[k] for k in shared), 2),
        }
    out = os.path.join(REPO, f"QUIET_BENCH_reference_round{rnd}.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=1)
        f.write("\n")
    print(out)
    if prior:
        print(json.dumps(record["_vs_prior_quiet"], indent=1))


if __name__ == "__main__":
    main()
