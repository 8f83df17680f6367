"""Ordered-event funnel analysis (the ClickHouse ``windowFunnel`` /
product-analytics staple): how many users progressed view → click →
purchase, where each step must happen STRICTLY AFTER the previous
step's match, and matching is greedy-earliest (step k matches the first
qualifying event after step k-1's match — the same chain
``t1 = min(ts | step1)``, ``t2 = min(ts | step2, ts > t1)``, ... defines).

Spark-first shape: ONE shuffle. Events group per user into a
time-sorted array and a JVM-side ``aggregate`` fold walks it once,
advancing the stage pointer — no per-step self-joins (the naive SQL
formulation scans/join-shuffles once PER STEP, which is also what the
DuckDB oracle does; the fold is provably the same chain). Per-user
event counts are bounded in practice; a pathological hot user salts
like any hot key.

The reference has no funnel endpoint; this extends the §2.C analytics
family (monthly-active-wallets, history-stats) with the standard
conversion metric over the same event stream.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def funnel_stages(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user furthest funnel stage: ``(user, stage)`` with stage in
    [0, len(steps)] — 0 means step 1 never happened. Strictly-increasing
    timestamps between consecutive steps; simultaneous events (equal
    ts) cannot satisfy two adjacent steps, matching the oracle's
    ``ts > prev`` chain exactly."""
    steps = list(steps)
    ev = events.filter(F.col(type_col).isin(steps)).select(
        F.col(user_col),
        F.col(ts_col).alias("__ts"),
        F.col(type_col).alias("__type"),
    )
    per_user = ev.groupBy(user_col).agg(
        F.array_sort(F.collect_list(F.struct(F.col("__ts"), F.col("__type")))).alias("__seq")
    )

    # Fold state: (stage reached so far, ts of that stage's match).
    step_arr = F.array(*[F.lit(s) for s in steps])

    def advance(acc: Column, e: Column) -> Column:
        want = F.get(step_arr, acc["stage"])  # null once stage == len(steps)
        hit = want.isNotNull() & (e["__type"] == want) & (
            (acc["stage"] == 0) | (e["__ts"] > acc["ts"])
        )
        return F.when(
            hit,
            F.struct((acc["stage"] + 1).alias("stage"), e["__ts"].alias("ts")),
        ).otherwise(acc)

    init = F.struct(
        F.lit(0).alias("stage"), F.lit(None).cast("timestamp").alias("ts")
    )
    stage = F.aggregate(F.col("__seq"), init, advance, lambda acc: acc["stage"])
    return per_user.select(F.col(user_col), stage.alias("stage"))


def funnel_report(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Stage-level rollup: for each step k (1-based), how many users
    reached AT LEAST stage k, plus conversion from the previous step.
    Output is len(steps) rows: (stage, step_name, n_users, conversion).
    """
    steps = list(steps)
    stages = funnel_stages(events, steps, user_col, ts_col, type_col)
    counts = (
        stages.groupBy("stage").agg(F.count(F.lit(1)).alias("n")).filter(F.col("stage") > 0)
    )
    spark = events.sparkSession
    dim = spark.createDataFrame(
        [(i + 1, s) for i, s in enumerate(steps)], "stage int, step_name string"
    )
    # users at >= stage k: reverse cumulative sum over the stage dimension
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("stage")).rowsBetween(Window.unboundedPreceding, 0)
    at_least = (
        dim.join(counts, "stage", "left")
        .withColumn("n_users", F.sum(F.coalesce(F.col("n"), F.lit(0))).over(w))
        .drop("n")
    )
    prev = F.lag("n_users").over(Window.orderBy("stage"))
    return at_least.select(
        "stage",
        "step_name",
        F.col("n_users").cast("bigint").alias("n_users"),
        (F.col("n_users").cast("double") / F.coalesce(prev, F.col("n_users")).cast("double"))
        .alias("conversion"),
    )
