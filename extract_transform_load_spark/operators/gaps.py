"""Block-gap detection (missing-id ranges in an append-only ledger).

The reference finds missing block ranges with ``LEAD(id) OVER (ORDER BY
id)`` then filters ``next != id + 1`` (SURVEY.md §2.A A4 / §2.B B21;
`dao/postgre/block.rs:29-74`), feeding the backfill scheduler.

Two formulations:

- ``find_gaps`` — the literal LEAD window. A global ``Window.orderBy``
  collapses to a single partition, which is fine for the reference's
  workload (block ids are ~1e7 rows of bigint = a few hundred MB) but is
  the wrong default at 100 TB.
- ``find_gaps_scalable`` — range-partition the ids (``repartitionByRange``)
  and run the LEAD window *within* each range partition, then handle the
  partition-boundary seams by comparing per-partition min/max on the
  driver (tiny: one row per partition). Fully parallel; no single-task
  sort. This is the one wired into the registry.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def find_gaps(df: DataFrame, id_col: str) -> DataFrame:
    """Return (gap_start, gap_end) for every missing run of ids."""
    ids = df.select(F.col(id_col).alias("id")).distinct()
    w = Window.orderBy("id")
    return (
        ids.withColumn("next_id", F.lead("id", 1).over(w))
        .filter(F.col("next_id") > F.col("id") + 1)
        .select(
            (F.col("id") + 1).alias("gap_start"),
            (F.col("next_id") - 1).alias("gap_end"),
        )
    )


def find_gaps_scalable(df: DataFrame, id_col: str, num_ranges: int | None = None) -> DataFrame:
    """Gap detection without a global sort.

    Shuffle ids by range, detect gaps inside each partition with a
    partitioned LEAD window keyed by ``spark_partition_id`` — adjacent ids
    land in the same range partition except at seam boundaries, which are
    reconciled with a second tiny window over per-partition (min, max)
    aggregates (O(#partitions) rows).
    """
    ids = df.select(F.col(id_col).alias("id")).distinct()
    if num_ranges:
        ids = ids.repartitionByRange(num_ranges, "id")
    else:
        ids = ids.repartitionByRange("id")
    ids = ids.withColumn("__part", F.spark_partition_id())

    w_in = Window.partitionBy("__part").orderBy("id")
    inner = (
        ids.withColumn("next_id", F.lead("id", 1).over(w_in))
        .filter(F.col("next_id") > F.col("id") + 1)
        .select((F.col("id") + 1).alias("gap_start"), (F.col("next_id") - 1).alias("gap_end"))
    )

    bounds = ids.groupBy("__part").agg(F.min("id").alias("lo"), F.max("id").alias("hi"))
    w_b = Window.orderBy("lo")  # O(#partitions) rows — trivially small
    seams = (
        bounds.withColumn("next_lo", F.lead("lo", 1).over(w_b))
        .filter(F.col("next_lo") > F.col("hi") + 1)
        .select((F.col("hi") + 1).alias("gap_start"), (F.col("next_lo") - 1).alias("gap_end"))
    )
    return inner.unionByName(seams)
