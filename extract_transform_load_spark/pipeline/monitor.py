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
from pyspark.sql import Column, DataFrame, Observation, Window


def observe_counts(
    df: DataFrame, flags: dict[str, Column], name: str = "pipeline"
) -> tuple[DataFrame, Observation]:
    """Attach row-count + per-flag-count metrics to a frame's next action.

    ``flags`` maps metric name → boolean column (e.g. ``{"skipped":
    col("event_type").isNull()}``). Returns the instrumented frame and
    the ``Observation``; read ``observation.get`` AFTER an action has
    materialized the frame. Single consumer rule: observe once per
    frame, fan metrics out from the dict.

    Streaming frames use the named-observe form (the ``Observation``
    class is batch-only) and return ``None`` for the observation: read
    the per-microbatch values from
    ``StreamingQueryProgress.observedMetrics[name]`` instead — same
    metric expressions, zero extra passes, per-batch granularity.
    """
    metrics = [F.count(F.lit(1)).alias("rows")]
    for metric, flag in flags.items():
        metrics.append(
            F.coalesce(F.sum(F.when(flag, 1).otherwise(0)), F.lit(0)).alias(metric)
        )
    if df.isStreaming:
        return df.observe(name, *metrics), None
    obs = Observation(name)
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
    # Generated aliases (__chk_i) + single-quote-escaped display labels:
    # splicing user-provided check names into identifiers breaks on
    # non-identifier names and collides with n_rows.
    names = list(checks)
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_rows")] + [
        F.sum(F.when(checks[n], 1).otherwise(0)).cast("bigint").alias(f"__chk_{i}")
        for i, n in enumerate(names)
    ]
    wide = df.agg(*aggs)
    def _lbl(n: str) -> str:
        return n.replace("'", "''")
    stack_expr = ", ".join(f"'{_lbl(n)}', __chk_{i}" for i, n in enumerate(names))
    return wide.selectExpr(
        f"stack({len(names)}, {stack_expr}) AS (check_name, violations)", "n_rows"
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
    # SQL referential-integrity semantics: a NULL child key is not an
    # orphan (it references nothing) — without the filter every NULL-key
    # row counts as a violation because anti-joins never match NULLs.
    orphans = child.filter(F.col(key).isNotNull()).join(
        parent.select(F.col(parent_key).alias(key)).distinct(), key, "left_anti"
    )
    return orphans.agg(
        F.lit(f"{key}_references_{parent_key}").alias("check_name"),
        F.count(F.lit(1)).cast("bigint").alias("violations"),
    ).crossJoin(
        child.agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    ).select("check_name", "violations", "n_rows")


def profile_table(
    df: DataFrame,
    columns: list[str],
    numeric: list[str] | None = None,
    approx_distinct: bool = False,
) -> DataFrame:
    """One-pass column profiler: (column, n_rows, n_null, n_distinct,
    min_num, max_num) per profiled column — the table-level health view
    a 100 TB lakehouse publishes next to each dataset (null-rate spikes
    and cardinality collapses are the two cheapest drift tells).

    All per-column aggregates compile into ONE aggregate over one scan;
    min/max are reported for ``numeric`` columns only (double-cast) —
    stringified min/max of doubles is an engine-portability trap (Java
    vs DuckDB float formatting), so non-numeric columns report NULL.

    Exact ``count(distinct)`` over k columns plans an Expand (k× the
    scan's rows through the aggregate). That is the oracle-checkable
    form; pass ``approx_distinct=True`` at scale for one HLL sketch per
    column instead (±2%, no Expand).
    """
    if not columns:
        raise ValueError("columns must be non-empty")
    numeric = numeric or []
    aggs: list[Column] = [F.count(F.lit(1)).cast("bigint").alias("n_rows")]
    for c in columns:
        aggs.append((F.count(F.lit(1)) - F.count(c)).cast("bigint").alias(f"__null_{c}"))
        nd = F.approx_count_distinct(c) if approx_distinct else F.countDistinct(c)
        aggs.append(nd.cast("bigint").alias(f"__nd_{c}"))
        if c in numeric:
            aggs.append(F.min(F.col(c).cast("double")).alias(f"__min_{c}"))
            aggs.append(F.max(F.col(c).cast("double")).alias(f"__max_{c}"))
    wide = df.agg(*aggs)
    parts = []
    for c in columns:
        # backticked aliases + escaped labels: raw column names with
        # spaces/punctuation must survive the selectExpr round trip
        lo = f"`__min_{c}`" if c in numeric else "CAST(NULL AS DOUBLE)"
        hi = f"`__max_{c}`" if c in numeric else "CAST(NULL AS DOUBLE)"
        lbl = c.replace("'", "''")
        parts.append(f"'{lbl}', `__null_{c}`, `__nd_{c}`, {lo}, {hi}")
    return wide.selectExpr(
        f"stack({len(columns)}, {', '.join(parts)}) "
        "AS (column, n_null, n_distinct, min_num, max_num)",
        "n_rows",
    ).select("column", "n_rows", "n_null", "n_distinct", "min_num", "max_num")


def psi_drift(
    cohort_a: DataFrame,
    cohort_b: DataFrame,
    bucket: Column,
    smoothing: int = 1,
) -> DataFrame:
    """Population-stability-index drift between two cohorts over a
    shared bucketing: per-bucket (bucket, p_a, p_b, contrib) rows whose
    ``SUM(contrib)`` is the PSI (rule of thumb: >0.2 = shifted).

    The monitor for "is this week's crawl the same distribution we
    trained on" — over length buckets, quality-score buckets, language
    shares. Laplace ``smoothing`` keeps empty buckets finite (and is
    what makes the statistic well-defined when a bucket exists in only
    one cohort). Arithmetic is engine-portable: exact bigint counts,
    IEEE double ratios in a fixed evaluation order; the ln-derived
    contribution is cast to DECIMAL(38,12) because JVM Math.log and
    DuckDB libm disagree in the last ulp for some inputs (q73 rule).

    Scale: each cohort collapses to one tiny per-bucket count aggregate
    before anything joins — the full-outer join is over bucket
    cardinality (dozens), never rows.
    """
    if smoothing <= 0:
        # log(0) contributions would go NULL and silently VANISH from
        # SUM(contrib) — exactly the strongest-drift buckets
        raise ValueError("smoothing must be > 0 (keeps one-sided buckets finite)")
    ca = cohort_a.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_a")
    )
    cb = cohort_b.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_b")
    )
    tot_a = cohort_a.agg(F.count(F.lit(1)).cast("bigint").alias("tot_a"))
    tot_b = cohort_b.agg(F.count(F.lit(1)).cast("bigint").alias("tot_b"))
    # eqNullSafe: a NULL bucket present in both cohorts must match
    # itself — the plain key join emits two half-rows and overstates PSI
    cbn = cb.withColumnRenamed("bucket", "__bucket_b")
    joined = (
        ca.join(cbn, F.col("bucket").eqNullSafe(F.col("__bucket_b")), "full_outer")
        .select(
            F.coalesce(F.col("bucket"), F.col("__bucket_b")).alias("bucket"),
            "n_a",
            "n_b",
        )
        .crossJoin(F.broadcast(tot_a))
        .crossJoin(F.broadcast(tot_b))
    )
    nb = F.count(F.lit(1)).over(Window.partitionBy())
    s = F.lit(float(smoothing))
    p_a = (F.coalesce(F.col("n_a"), F.lit(0)).cast("double") + s) / (
        F.col("tot_a").cast("double") + s * nb.cast("double")
    )
    p_b = (F.coalesce(F.col("n_b"), F.lit(0)).cast("double") + s) / (
        F.col("tot_b").cast("double") + s * nb.cast("double")
    )
    return joined.select(
        "bucket",
        p_a.alias("p_a"),
        p_b.alias("p_b"),
        # DECIMAL(38,12): ln's last-ulp rounding differs between JVM
        # Math.log and DuckDB's libm for some inputs (surfaced at
        # sf0.01), so the ln-derived contribution is truncated past the
        # divergence before any cross-engine hash — q73's rule.
        # ... then presented as double: result columns never ship Decimal
        # objects (the driver's pandas path collapses DECIMAL to float64).
        ((p_a - p_b) * (F.log(p_a) - F.log(p_b)))
        .cast("decimal(38,12)")
        .cast("double")
        .alias("contrib"),
    )


def robust_outliers(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    z: float = 3.0,
    approx: bool = False,
) -> DataFrame:
    """Median/MAD robust outlier detection per key group.

    Mean/stddev z-scores are poisoned by the outliers they hunt; the
    robust pair (median, median-absolute-deviation × 1.4826) is the
    standard fix. Rows with |value − med| > z · 1.4826 · MAD are
    returned with their ``med``/``mad``/``robust_z`` evidence columns;
    zero-MAD groups (constant values) flag nothing rather than
    dividing by zero.

    Two grouped percentile passes + two broadcast-backs of the tiny
    per-group stats — the fact table never shuffles. Exact
    ``percentile`` buffers each group's values in the aggregate (the
    oracle-checkable form, and fine for bounded group counts);
    ``approx=True`` swaps both medians for ``approx_percentile`` — the
    constant-memory sketch the same query needs at 100 TB.
    """
    pct = "approx_percentile" if approx else "percentile"
    med = df.groupBy(*key_cols).agg(
        F.expr(f"{pct}({value_col}, 0.5)").alias("__med")
    )
    with_med = df.join(F.broadcast(med), key_cols)
    mad = with_med.groupBy(*key_cols).agg(
        F.expr(f"{pct}(abs({value_col} - __med), 0.5)").alias("__mad")
    )
    out = with_med.join(F.broadcast(mad), key_cols)
    z_col = (F.col(value_col) - F.col("__med")) / (F.lit(1.4826) * F.col("__mad"))
    return (
        out.filter((F.col("__mad") > 0) & (F.abs(z_col) > F.lit(z)))
        .select(
            *df.columns,
            F.col("__med").alias("med"),
            F.col("__mad").alias("mad"),
            z_col.alias("robust_z"),
        )
    )
