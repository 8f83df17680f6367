"""Shared helpers for the measurement scripts (single source of truth —
the REST-polling logic must not fork between benches, or two scripts
silently measure shuffle bytes differently)."""

from __future__ import annotations

import json
import urllib.request


def _stage_totals(spark) -> tuple[int, int]:
    """(shuffle-write bytes, spill bytes mem+disk) across all completed
    stages so far, via the Spark UI REST API (requires
    ``spark.ui.enabled=true``; diff around a query = that query's
    traffic). Returns (-1, -1) when the UI is off or the poll fails —
    callers must treat a -1 on EITHER side of a diff as 'no
    measurement'."""
    ui = spark.sparkContext.uiWebUrl
    if not ui:
        return -1, -1
    try:
        apps = json.load(
            urllib.request.urlopen(f"{ui}/api/v1/applications", timeout=10)
        )
        stages = json.load(
            urllib.request.urlopen(
                f"{ui}/api/v1/applications/{apps[0]['id']}/stages?status=complete",
                timeout=30,
            )
        )
        return (
            sum(s.get("shuffleWriteBytes", 0) for s in stages),
            sum(
                s.get("memoryBytesSpilled", 0) + s.get("diskBytesSpilled", 0)
                for s in stages
            ),
        )
    except Exception:
        return -1, -1


def shuffle_write_bytes(spark) -> int:
    """Back-compat single-metric form of :func:`_stage_totals`."""
    return _stage_totals(spark)[0]


def measure(spark, fn) -> dict:
    """Run ``fn()`` (an action) once, returning wall seconds plus the
    shuffle-write MB and spill MB (memory+disk) it produced (None when
    either REST poll fails) — the one stage-metrics-diff implementation
    shared by every bench script."""
    import time

    sw0, sp0 = _stage_totals(spark)
    t0 = time.time()
    fn()
    wall = time.time() - t0
    sw1, sp1 = _stage_totals(spark)
    ok = sw0 >= 0 and sw1 >= 0
    return {
        "wall_s": round(wall, 2),
        "shuffle_mb": round((sw1 - sw0) / 1e6, 1) if ok else None,
        "spill_mb": round((sp1 - sp0) / 1e6, 1) if ok else None,
    }
