"""As-of (point-in-time) join.

The reference implements this as a correlated ``LEFT JOIN LATERAL ...
WHERE price_ts <= event_ts ORDER BY ts DESC LIMIT 1`` against the price
table (SURVEY.md §2.B B7; reference `dao/postgre/ls_opening.rs:1460-1467`,
`mp_asset.rs:125-187`). Postgres runs that as an index probe per row —
O(rows) random lookups, which does not translate to a scan engine.

Spark-first formulation — the *union-sort* trick:

1. Tag right rows (the tick/price series) with their value columns and
   left rows with nulls for those columns; union them.
2. One shuffle: ``Window.partitionBy(keys).orderBy(ts, side)`` where
   right rows sort *before* left rows at equal timestamps (a tick at
   exactly the event time is visible to the event).
3. ``last(value, ignorenulls=True)`` over rows UNBOUNDED PRECEDING →
   CURRENT ROW carries the most recent right value forward.
4. Keep only left rows.

Scale properties: exactly ONE shuffle of (|L| + |R|) rows hash-partitioned
by key — no range-explosion, no per-row probes, no broadcast requirement.
Within-partition sort is what the shuffle already does. Skewed keys can be
AQE-split because the window partitions by join key only. This is the same
strategy Flink's temporal join and Delta's `MERGE`-free SCD reads use.

Tie-breaking is deterministic: among right rows sharing a timestamp the
one with the greatest ``right_order`` column wins (matches the reference's
``ORDER BY ts DESC, idx DESC LIMIT 1`` determinization).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    right_order: str | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each ``left`` row, attach the latest ``right`` values with
    ``right[right_ts] <= left[left_ts]``, matching on key columns ``on``.

    Returns all ``left`` columns plus ``{value_col}{suffix}`` for each
    requested value column (null when no prior right row exists).
    """
    on = list(on)
    value_cols = list(value_cols)
    out_cols = [f"{c}{suffix}" for c in value_cols]

    # Side marker: right=0 sorts before left=1 at equal timestamps.
    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__side"),
        F.col(left_ts).alias("__ts"),
        F.lit(None).cast("double").alias("__rord"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(o) for c, o in zip(value_cols, out_cols)],
    )
    rord = F.col(right_order).cast("double") if right_order else F.lit(0.0)
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in on],
        *[F.col(c) for c in on],
        F.lit(0).alias("__side"),
        F.col(right_ts).alias("__ts"),
        rord.alias("__rord"),
        *[F.col(c).alias(o) for c, o in zip(value_cols, out_cols)],
    )
    unioned = l_tagged.unionByName(r_tagged)

    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc(), F.col("__rord").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *[c for c in unioned.columns if c not in out_cols],
        *[F.last(o, ignorenulls=True).over(w).alias(o) for o in out_cols],
    )
    return filled.filter(F.col("__side") == 1).drop("__side", "__ts", "__rord")
