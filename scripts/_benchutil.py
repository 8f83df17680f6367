"""Shared helpers for the measurement scripts (single source of truth —
the REST-polling logic must not fork between benches, or two scripts
silently measure shuffle bytes differently)."""

from __future__ import annotations

import json
import urllib.request


def shuffle_write_bytes(spark) -> int:
    """Total shuffle-write bytes across all completed stages so far, via
    the Spark UI REST API (requires ``spark.ui.enabled=true``; diff
    around a query = that query's shuffle traffic). Returns -1 when the
    UI is off or the poll fails — callers must treat a -1 on EITHER side
    of a diff as 'no measurement'."""
    ui = spark.sparkContext.uiWebUrl
    if not ui:
        return -1
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
        return sum(s.get("shuffleWriteBytes", 0) for s in stages)
    except Exception:
        return -1


def measure(spark, fn) -> dict:
    """Run ``fn()`` (an action) once, returning wall seconds and the
    shuffle-write MB it produced (None when either REST poll fails) —
    the one shuffle-diff implementation shared by every bench script."""
    import time

    sw0 = shuffle_write_bytes(spark)
    t0 = time.time()
    fn()
    wall = time.time() - t0
    sw1 = shuffle_write_bytes(spark)
    return {
        "wall_s": round(wall, 2),
        "shuffle_mb": round((sw1 - sw0) / 1e6, 1)
        if sw0 >= 0 and sw1 >= 0
        else None,
    }
