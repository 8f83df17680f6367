"""Mergeable distinct-count sketches (Apache DataSketches HLL, built in
to Spark 4: ``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``).

``approx_count_distinct`` (q60) answers ONE fixed grouping per scan. A
100 TB events table asked for month-over-rolling-month active users,
per event_type AND overall, would rescan raw history for every window.
The sketch path materializes a tiny pre-aggregate once — one HLL
sketch per (day, event_type) — and every later question is a union of
sketches: any date range, any dimension subset, no raw-data rescan.
Sketch unions are exact over the sketch algebra (the estimate error is
the sketch's, never compounded by merging), which is what makes the
pre-aggregate safe to serve from.

This is the engine-side twin of the reference API's cached aggregate
endpoints (SURVEY §2.C — TTL-cached distinct counts): instead of a
cache that expires, a sketch table that folds.

Scale: the sketch table has (days × types) rows of ~`2^lgk` bytes;
building it is one map-side-combinable aggregate over the fact scan;
every rollup after that reads kilobytes. Sketches are deterministic
for a given input multiset, so rollups are reproducible.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

DEFAULT_LGK = 12  # 4 KiB per sketch, ~1.6% relative standard error


def build_distinct_sketches(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    lgk: int = DEFAULT_LGK,
    sketch_col: str = "sketch",
) -> DataFrame:
    """One HLL sketch of ``value_col`` per ``group_cols`` cell — the
    persistable pre-aggregate (write it partitioned by day)."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lgk)).alias(sketch_col)
    )


def merge_distinct_estimate(
    sketches: DataFrame,
    group_cols: Sequence[str],
    sketch_col: str = "sketch",
    estimate_col: str = "n_distinct",
) -> DataFrame:
    """Fold sketches down to ``group_cols`` (any subset of the build
    grouping, including none for a grand total) and estimate."""
    g = list(group_cols)
    agg = F.hll_sketch_estimate(
        F.hll_union_agg(F.col(sketch_col), F.lit(True))
    ).alias(estimate_col)
    if g:
        return sketches.groupBy(*g).agg(agg)
    return sketches.agg(agg)
