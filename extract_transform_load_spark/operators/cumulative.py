"""Scalable running totals: two-phase bucketed cumulative sum.

``Window.orderBy(...)`` with no partitioning funnels the entire series
through ONE task — the round-1 scale-weak spot in the cumulative-sum
query (B23, `tr_profit.rs:110-121`). The classic distributed fix keeps
the exact per-row semantics with no single-task window over the data:

1. bucket the series on a coarse prefix of the sort order (e.g. month);
2. per-bucket totals (one small aggregate, O(buckets) rows) get their
   EXCLUSIVE running offsets via a window over that tiny table;
3. the per-row cumulative sum runs in a window PARTITIONED by bucket
   (parallel across buckets) and adds the broadcast bucket offset.

Correct because the bucket expression is monotone in the sort order, so
``global cumsum(row) = offset(bucket) + cumsum within bucket``. The
only unpartitioned window left runs over O(buckets) rows — serving-size
at any corpus scale.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def running_total(
    df: DataFrame,
    order_cols: Sequence[str],
    value_col: Column,
    bucket: Column,
    out_col: str = "running_total",
) -> DataFrame:
    """Exact cumulative sum of ``value_col`` over ``order_cols``.

    ``bucket`` MUST be a monotone function of the leading sort column
    (``date_trunc`` of a timestamp ordering, id div N of an id
    ordering). ``value_col`` should already be decimal-cast — sums stay
    exact and partition-order-independent (functions/decimals.py).
    """
    b = df.withColumn("__bucket", bucket).withColumn("__val", value_col)
    per_bucket = b.groupBy("__bucket").agg(F.sum("__val").alias("__bsum"))
    w_off = (
        Window.orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = per_bucket.select(
        "__bucket",
        F.coalesce(F.sum("__bsum").over(w_off), F.lit(0).cast("decimal(38,6)")).alias(
            "__offset"
        ),
    )
    w_in = (
        Window.partitionBy("__bucket")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Null-safe equi-join: a NULL order key produces a NULL bucket, and
    # a plain equi-join would silently drop those rows (NULL != NULL) —
    # the global-window formulation this replaces kept them, first
    # (nulls-first), which is also where ORDER BY __bucket places the
    # NULL bucket's offset window.
    off = offsets.withColumnRenamed("__bucket", "__obucket")
    return (
        b.join(F.broadcast(off), F.col("__bucket").eqNullSafe(F.col("__obucket")))
        .withColumn(out_col, F.sum("__val").over(w_in) + F.col("__offset"))
        .drop("__bucket", "__obucket", "__val", "__offset")
    )
