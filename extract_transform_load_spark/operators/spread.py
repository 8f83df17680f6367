"""Parallelism guard for CPU-bound Arrow map stages.

Parquet scan granularity is the row group: a small input written as one
row group plans ONE task, so a per-row CPU-heavy ``mapInPandas`` stage
(winnowing extraction, PQ encoding, signature computation) runs on one
core however many the session has — measured at sf0.1: a 10x corpus
laid out as 32 row groups took the same wall-clock as 1x in a single
row group. ``spread_small_scan`` repartitions ONLY when the planned
scan carries fewer partitions than the session's parallelism: at
warehouse scale inputs have thousands of row groups and the predicate
is false (the corpus never shuffles); when it fires, the shuffle moves
just the undersized input — megabytes, by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_small_scan(df: DataFrame) -> DataFrame:
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
