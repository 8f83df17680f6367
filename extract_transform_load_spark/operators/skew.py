"""Skew mitigation: salted aggregation and salted broadcast-side joins.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
the session factory) handles sort-merge join skew at runtime. Two cases
it does NOT cover, provided here:

- ``salted_agg``: a groupBy where one key holds a large fraction of all
  rows (e.g. one hot trading pair, one dominant document source). The
  two-phase trick: aggregate on (key, salt) first — spreads the hot key
  over N reducers — then re-aggregate on key. Only works for
  *decomposable* aggregates (sum/count/min/max); avg must be derived
  from sum+count by the caller.
- ``salted_broadcast_join``: replicate the small side N× with a salt
  column so a hot fact key fans across N tasks instead of one. Only
  needed when the join must be shuffle-based but one key dominates;
  with an actual broadcast join skew is irrelevant (no shuffle), so
  reach for ``F.broadcast`` first.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    num_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column → (input column, fn) with fn in
    {"sum", "count", "min", "max"}. Example::

        salted_agg(events, ["symbol"], {"total": ("amount", "sum"),
                                        "n": ("amount", "count")})

    Phase 1 groups on (keys, random salt) — the hot key's rows split
    across ``num_salts`` reducers; phase 2 merges the partials (count
    merges with sum). The extra shuffle is tiny: |keys| × num_salts rows.
    """
    keys = list(keys)
    salt = (F.rand(seed=42) * num_salts).cast("int").alias("__salt")

    phase1_aggs: list[Column] = []
    phase2_aggs: list[Column] = []
    for out, (col, fn) in aggs.items():
        if fn == "sum":
            phase1_aggs.append(F.sum(col).alias(out))
            phase2_aggs.append(F.sum(out).alias(out))
        elif fn == "count":
            phase1_aggs.append(F.count(col).alias(out))
            phase2_aggs.append(F.sum(out).cast("bigint").alias(out))
        elif fn == "min":
            phase1_aggs.append(F.min(col).alias(out))
            phase2_aggs.append(F.min(out).alias(out))
        elif fn == "max":
            phase1_aggs.append(F.max(col).alias(out))
            phase2_aggs.append(F.max(out).alias(out))
        else:
            raise ValueError(f"non-decomposable aggregate {fn!r}")

    partial = df.select(*df.columns, salt).groupBy(*keys, "__salt").agg(*phase1_aggs)
    return partial.groupBy(*keys).agg(*phase2_aggs)


def salted_broadcast_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Shuffle-join with the dim side replicated across salts.

    fact rows get a random salt in [0, num_salts); dim rows are exploded
    to every salt value, so join key becomes (on, salt) and a hot key's
    fact rows land on ``num_salts`` different reducers.
    """
    salted_fact = fact.withColumn("__salt", (F.rand(seed=42) * num_salts).cast("int"))
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    out = salted_fact.join(salted_dim, [on, "__salt"], how)
    return out.drop("__salt")


def skew_report(
    df: DataFrame, keys: Sequence[str], top_n: int = 20
) -> DataFrame:
    """Key-concentration diagnosis: the top-N hottest key values with
    their row share and cumulative share — the measurement that decides
    whether a join/agg needs :func:`salted_agg`, AQE skew splitting, or
    nothing (rule of thumb: top-1 share ≫ 1/shuffle-partitions means
    one reducer owns the key's whole row mass).

    Scale shape: one partial-combined count aggregate, then
    ``orderBy(n).limit(top_n)`` — which the planner executes as
    TakeOrdered (top-N per partition, never a global sort of the key
    space) — then share arithmetic on the ≤ top_n survivors with the
    scalar total broadcast in. Deterministic tie-break on the key.
    """
    keys = list(keys)
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    total = counts.agg(F.sum("n").cast("bigint").alias("total"))
    top = counts.orderBy(F.col("n").desc(), *[F.col(k).asc() for k in keys]).limit(top_n)
    from pyspark.sql import Window

    w_rank = Window.orderBy(F.col("n").desc(), *[F.col(k).asc() for k in keys])
    w_cum = Window.orderBy("rank").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        top.withColumn("rank", F.row_number().over(w_rank))
        .crossJoin(F.broadcast(total))
        .select(
            *keys,
            "n",
            F.col("rank").cast("int").alias("rank"),
            (F.col("n").cast("double") / F.col("total").cast("double")).alias("share"),
            (
                F.sum("n").over(w_cum).cast("double") / F.col("total").cast("double")
            ).alias("cum_share"),
        )
    )
