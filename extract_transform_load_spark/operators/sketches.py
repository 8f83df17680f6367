"""Mergeable summaries: distinct-count sketches (Apache DataSketches
HLL, built in to Spark 4: ``hll_sketch_agg`` / ``hll_union_agg`` /
``hll_sketch_estimate``), KLL quantiles, theta set algebra — and the
Misra-Gries frequency summary behind the two-pass exact heavy hitter
(:func:`heavy_hitters_exact`).

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


def misra_gries_candidates(
    df: DataFrame,
    item_col: str,
    k: int,
) -> DataFrame:
    """Pass 1 of the two-pass exact heavy-hitter: per-partition
    Misra-Gries summaries (Misra & Gries 1982; merge rule and error
    bound from Agarwal et al., "Mergeable Summaries", PODS 2012 — both
    public), summed per item across partitions.

    Returns (item, est, is_meta): ``est`` is a LOWER bound on the true
    count, under-counting by at most N/(k+1) in total (N = number of
    non-null items); rows with ``is_meta`` true carry per-partition row
    counts (item NULL), so one scan yields candidates AND N. Every item
    with true frequency > N/(k+1) is guaranteed present — that is the
    candidate-completeness contract :func:`heavy_hitters_exact` builds
    on.

    Scale shape: memory is k counters per partition REGARDLESS of the
    item column's cardinality — the whole point vs ``groupBy(item)``,
    whose exchange carries every distinct item (a token column at
    100 TB has billions). The only shuffle here moves
    <= partitions x (k+1) rows. Batches are processed vectorized
    (``value_counts`` + index-aligned adds on the bounded counter
    frame), never per row; the per-batch merge is itself an MG merge,
    so the PODS'12 bound applies to the whole partition stream.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    import pandas as pd

    sel = df.select(F.col(item_col).cast("string").alias("item"))

    def summarize(batches):
        counters = pd.Series(dtype="int64")
        n_rows = 0
        for pdf in batches:
            vals = pdf["item"].dropna()
            n_rows += len(vals)
            if vals.empty:
                continue
            counters = counters.add(vals.value_counts(), fill_value=0)
            if len(counters) > k:
                # PODS'12 merge: subtract the (k+1)-th largest count
                # from everything, drop the non-positive — <= k
                # counters survive, and each subtraction event removes
                # >= (k+1) x d total mass, which is what bounds the
                # global under-count at N/(k+1)
                kth = counters.nlargest(k + 1).iloc[-1]
                counters = counters[counters > kth] - kth
        out = pd.DataFrame(
            {
                "item": counters.index.astype(object),
                "est": counters.to_numpy(dtype="int64"),
                "is_meta": False,
            }
        )
        meta = pd.DataFrame(
            {"item": [None], "est": [n_rows], "is_meta": [True]}
        )
        yield pd.concat([out, meta], ignore_index=True)

    partials = sel.mapInPandas(
        summarize, schema="item string, est long, is_meta boolean"
    )
    return partials.groupBy("item", "is_meta").agg(
        F.sum("est").alias("est")
    ).select("item", "est", "is_meta")


def heavy_hitters_exact(
    df: DataFrame,
    item_col: str,
    phi: float,
    out_item_col: str = "item",
) -> DataFrame:
    """Exact phi-heavy hitters in two bounded passes — every item whose
    frequency is >= ``phi`` x N (N = non-null rows), with its EXACT
    count and share. Deterministic output (unlike a raw sketch read):
    the candidate pass can only add sub-threshold candidates, never
    miss a true hitter, and the verify pass filters on exact counts —
    so results are partitioning-independent and a plain SQL
    ``GROUP BY ... HAVING count >= phi * N`` twin (registry row q160).

    Pass 1 (:func:`misra_gries_candidates` with ``k = ceil(1/phi)``,
    so N/(k+1) < phi x N strictly — candidate completeness): one scan,
    k counters per partition, a <= partitions x (k+1)-row shuffle.
    Pass 2: one more scan, semi-joined against the BROADCAST candidate
    list, exact counts over <= partitions x k distinct items. Neither
    pass ever exchanges on the raw item column — the 100 TB contrast
    with ``groupBy(item).count().filter(...)``, whose shuffle carries
    the full distinct-item set.

    The candidate frame is checkpointed eagerly (it is tiny and feeds
    both the N read and the verify join).
    """
    if not 0.0 < phi < 1.0:
        raise ValueError(f"phi must be in (0, 1), got {phi}")
    import math

    k = math.ceil(1.0 / phi)
    sel = df.select(F.col(item_col).cast("string").alias("item"))
    partials = misra_gries_candidates(sel, "item", k).localCheckpoint(
        eager=True
    )
    n_total = (
        partials.filter(F.col("is_meta")).agg(F.sum("est")).first()[0] or 0
    )
    if n_total == 0:
        return sel.sparkSession.createDataFrame(
            [], f"{out_item_col} string, n_occurrences bigint, share double"
        )
    cands = partials.filter(~F.col("is_meta") & (F.col("est") > 0)).select(
        "item"
    )
    exact = (
        sel.join(F.broadcast(cands), "item", "left_semi")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    return exact.filter(
        F.col("n_occurrences").cast("double")
        >= F.lit(float(phi)) * F.lit(float(n_total))
    ).select(
        F.col("item").alias(out_item_col),
        F.col("n_occurrences").cast("bigint").alias("n_occurrences"),
        (
            F.col("n_occurrences").cast("double") / F.lit(float(n_total))
        ).alias("share"),
    )


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
