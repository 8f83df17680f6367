"""Single-pass pipeline metrics via ``df.observe``.

The reference records per-block progress in ``action_history`` and logs
skip/parse failures inline (`event_dispatch.rs:31-191`). The naive scan-
engine translation — run the pipeline, then ``count()`` the inputs,
parsed rows and skips — re-scans the data once per metric, which at
100 TB turns monitoring into the dominant cost.

``observe`` attaches accumulator-style aggregates to the SAME pass the
sink action already makes: zero extra scans, exact counts (unlike
sampling), and it works identically on batch frames and streams
(streaming surfaces the metrics per-microbatch in
``StreamingQueryProgress.observedMetrics`` — wire them to the metrics
backend from a query listener).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Observation


def observe_counts(
    df: DataFrame, flags: dict[str, Column], name: str = "pipeline"
) -> tuple[DataFrame, Observation]:
    """Attach row-count + per-flag-count metrics to a frame's next action.

    ``flags`` maps metric name → boolean column (e.g. ``{"skipped":
    col("event_type").isNull()}``). Returns the instrumented frame and
    the ``Observation``; read ``observation.get`` AFTER an action has
    materialized the frame. Single consumer rule: observe once per
    frame, fan metrics out from the dict.
    """
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("rows")]
    for metric, flag in flags.items():
        metrics.append(
            F.coalesce(F.sum(F.when(flag, 1).otherwise(0)), F.lit(0)).alias(metric)
        )
    return df.observe(obs, *metrics), obs
