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
- **Z-ordering**: lives in ``operators/zorder.py`` (``zorder_key`` +
  ``write_zordered``) — Morton-interleave of per-column buckets so each
  file covers a small rectangle of a multi-column key space; min/max
  footer pruning then works for every listed column, not just a single
  sort key. Round 10 merged this module's former rank-bucket twin into
  that operator as its default ``quantize="quantile"`` mode (this
  module's design note stands: linear min/max scaling clumps skewed
  columns into few buckets and z-locality collapses — that mode is kept
  there only as the cross-engine oracle twin).
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


def rechunk_parquet_dir(
    src_dir: str,
    dst_dir: str,
    target_chunks: int | None = None,
    min_rows_per_chunk: int = 64,
) -> float:
    """Rewrite every parquet table under ``src_dir`` into ``dst_dir``
    split across ~``target_chunks`` part FILES each (a directory that
    still reads as ``{table}.parquet``); returns elapsed seconds.

    Spark plans scan tasks from file splits, and a split below
    ``maxSplitBytes`` (or a row group, whichever is coarser) never
    subdivides — so a small table written as one single-row-group file
    executes every scan + map stage on ONE core no matter the cluster
    size (row groups alone don't help below maxSplitBytes: a 20 MB
    32-group file still plans ~5 byte-range splits, measured). Separate
    part files parallelize unconditionally. Warehouse-scale tables
    carry thousands of files/row groups naturally; small extracts (and
    the driver fixtures here) don't — this is the ingest-side layout
    step that restores the scan parallelism the engine is designed
    around. Tables too small to split (< min_rows_per_chunk per chunk)
    copy through unchanged.
    """
    import os
    import shutil
    import time as _time

    import pyarrow.parquet as pq

    t0 = _time.perf_counter()
    target = target_chunks or (os.cpu_count() or 8)
    os.makedirs(dst_dir, exist_ok=True)
    for fname in sorted(os.listdir(src_dir)):
        if not fname.endswith(".parquet"):
            continue
        src = os.path.join(src_dir, fname)
        dst = os.path.join(dst_dir, fname)
        tbl = pq.read_table(src)
        n = tbl.num_rows
        chunk = max(min_rows_per_chunk, (n + target - 1) // target)
        if n <= chunk:
            shutil.copyfile(src, dst)
            continue
        os.makedirs(dst, exist_ok=True)
        for i, lo in enumerate(range(0, n, chunk)):
            pq.write_table(tbl.slice(lo, chunk), os.path.join(dst, f"part-{i:05d}.parquet"))
    return _time.perf_counter() - t0
