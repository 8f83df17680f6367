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


def expectation_report(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """Single-pass data-quality audit: violation counts per declared check.

    Deequ-style constraint verification, the gate a 100 TB ingest runs
    before promoting bronze → silver (the reference validates row-by-row
    inside each Rust parser — `event_parsing.rs:16-327` — and loses the
    corpus-level view; this is the set-at-once equivalent). Each check
    maps a name to a boolean column that is True when the row VIOLATES.
    All checks compile into ONE aggregate over one scan — adding a check
    is free; the naive one-count()-per-constraint loop re-reads the
    table per check. The wide one-row result is then unpivoted with
    ``stack`` driver-side-free into (check_name, violations, n_rows).

    Uniqueness (needs a distinct) and referential integrity (needs an
    anti-join) don't fit a plain sum: see :func:`expect_unique` and
    :func:`expect_references`; union their one-row outputs onto this.
    """
    if not checks:
        raise ValueError("checks must be non-empty")
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_rows")] + [
        F.sum(F.when(cond, 1).otherwise(0)).cast("bigint").alias(name)
        for name, cond in checks.items()
    ]
    wide = df.agg(*aggs)
    stack_expr = ", ".join(f"'{n}', {n}" for n in checks)
    return wide.selectExpr(
        f"stack({len(checks)}, {stack_expr}) AS (check_name, violations)", "n_rows"
    ).select("check_name", "violations", "n_rows")


def expect_unique(df: DataFrame, col: str) -> DataFrame:
    """Duplicate count among non-null values of ``col`` as a one-row
    (check_name, violations, n_rows) frame. One hash aggregate with
    partial (map-side) distinct — the exact form; at 100 TB swap in
    ``approx_count_distinct`` when a ±2% answer is acceptable."""
    return df.agg(
        F.lit(f"unique_{col}").alias("check_name"),
        (F.count(col) - F.countDistinct(col)).cast("bigint").alias("violations"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
    ).select("check_name", "violations", "n_rows")


def expect_references(
    child: DataFrame, key: str, parent: DataFrame, parent_key: str
) -> DataFrame:
    """Referential-integrity check: child rows whose ``key`` has no match
    in ``parent`` (orphans), as a one-row report frame. A left-anti join
    on the key — shuffles both sides at scale unless the parent
    broadcasts; orphan count 0 is the promotable state."""
    orphans = child.join(
        parent.select(F.col(parent_key).alias(key)).distinct(), key, "left_anti"
    )
    return orphans.agg(
        F.lit(f"{key}_references_{parent_key}").alias("check_name"),
        F.count(F.lit(1)).cast("bigint").alias("violations"),
    ).crossJoin(
        child.agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    ).select("check_name", "violations", "n_rows")
