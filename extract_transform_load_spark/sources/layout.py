"""Physical table layout for the 100 TB deployment.

The reference's physical tuning is Postgres B-tree indexes on
``(key, ts DESC)`` (migrations V004/V005 — SURVEY.md §4). The scan-engine
equivalents, provided here:

- **Date partitioning** (`write_partitioned`): entity tables partition by
  event date → every `period=`/`from=` window prunes partitions at plan
  time, the analogue of the ts-index range scan.
- **Sort-within-partitions on the access key** before write → parquet
  min/max row-group statistics make key lookups skip row groups, the
  analogue of the key index.
- **Bucketing** (`write_bucketed`): pre-shuffle the big join/agg keys
  (contract id, address) into a fixed bucket count so repeated
  joins/groupBys between co-bucketed tables skip their exchange
  entirely. Requires `saveAsTable` (bucket metadata lives in the
  catalog).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str,
    sort_keys: Sequence[str] = (),
    mode: str = "append",
) -> None:
    """Write an entity table partitioned by event date, row groups sorted
    by the access key for min/max skipping."""
    out = df.withColumn("__date", F.col(ts_col).cast("date"))
    if sort_keys:
        out = out.sortWithinPartitions(*sort_keys)
    out.write.partitionBy("__date").mode(mode).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_keys: Sequence[str],
    num_buckets: int = 64,
    sort_keys: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Catalog-managed bucketed table: joins/aggregations between tables
    bucketed on the same keys with the same count run exchange-free."""
    keys = list(bucket_keys)
    writer = df.write.mode(mode).bucketBy(num_buckets, keys[0], *keys[1:])
    if sort_keys:
        sk = list(sort_keys)
        writer = writer.sortBy(sk[0], *sk[1:])
    writer.saveAsTable(table)
