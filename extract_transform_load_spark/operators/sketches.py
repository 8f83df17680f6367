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


def build_quantile_sketches(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: int = 200,
    sketch_col: str = "sketch",
) -> DataFrame:
    """One KLL quantile sketch (DataSketches, built in to Spark 4 as
    ``kll_sketch_agg_double``) of ``value_col`` per ``group_cols`` cell —
    the quantile twin of the HLL distinct pre-aggregate above. k=200
    bounds single-sided rank error at ~1.65%; kilobytes per sketch."""
    return df.groupBy(*group_cols).agg(
        F.expr(f"kll_sketch_agg_double(`{value_col}`, {int(k)})").alias(sketch_col)
    )


def merge_quantile_estimates(
    sketches: DataFrame,
    group_cols: Sequence[str],
    quantiles: Sequence[float] = (0.5, 0.9, 0.99),
    sketch_col: str = "sketch",
) -> DataFrame:
    """Fold KLL sketches down to ``group_cols`` and read quantiles.
    Merging keeps the rank-error guarantee (KLL is fully mergeable), so
    any date-range/dimension fold of the pre-aggregate serves
    percentiles without rescanning raw history — the sketch answer to
    q52's exact percentiles the way q97 answers q18's distincts."""
    g = list(group_cols)
    merged = (
        sketches.groupBy(*g) if g else sketches.groupBy()
    ).agg(F.expr(f"kll_merge_agg_double(`{sketch_col}`)").alias("__m"))
    def _pname(q: float) -> str:
        # q=1.0 must not mangle to 'p0' (str(1.0)[2:] == '0' collides
        # with q=0.0); endpoints get explicit names, interior quantiles
        # keep their historical fraction-digit names (0.5 -> p5,
        # 0.99 -> p99) that the oracle twins reference.
        if q >= 1.0:
            return "p100"
        if q <= 0.0:
            return "p0"
        return f"p{str(q)[2:]}"

    cols = [F.col(c) for c in g] + [
        F.expr(f"kll_sketch_get_quantile_double(`__m`, {q})").alias(_pname(q))
        for q in quantiles
    ]
    return merged.select(*cols)


def build_theta_sketches(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    sketch_col: str = "sketch",
) -> DataFrame:
    """One theta sketch of ``value_col`` per ``group_cols`` cell. Theta
    sketches add what HLL cannot: set ALGEBRA — union, intersection,
    and difference of distinct sets, all mergeable. Below the sketch's
    nominal-entries threshold (default 2^12) the sketch retains every
    hashed key, so estimates — including intersections — are exact.
    """
    return df.groupBy(*group_cols).agg(
        F.expr(f"theta_sketch_agg(`{value_col}`)").alias(sketch_col)
    )
