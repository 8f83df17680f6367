"""Gold-layer materialization — the engine's answer to the reference's
response-cache stack (SURVEY.md §2.A A23).

The reference keeps three cache layers (moka TTL response caches with
stampede protection, a proactive refresher at 80% TTL, an in-memory
latest-price map — `cache_refresher.rs:41-260`, `configuration.rs:56-57`)
because every API hit re-runs SQL in Postgres. A scan engine inverts
this: precompute the query results as *gold tables* on the aggregation
cadence, and serving reads become point lookups. The 1-hour-TTL caches in
the reference are already documented as "refreshed by aggregation task" —
this module makes that the only mechanism.

``GoldTable`` couples a builder (any registry query or pipeline function)
with a storage path; ``refresh`` rewrites the snapshot atomically
(write-to-temp + swap is the parquet analogue of the reference's
stampede-safe cache fill).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class GoldTable:
    name: str
    builder: Callable[[SparkSession], DataFrame]
    path: str
    refresh_seconds: int = 3600  # reference's aggregated-state TTL
    #: optional roll-forward: (spark, previous snapshot) -> next snapshot.
    #: When set, ``refresh(incremental=True)`` applies only the event
    #: delta (pipeline.snapshots.*_incremental) instead of rebuilding
    #: from the full log — the hourly round costs O(delta + state).
    incremental: Callable[[SparkSession, DataFrame], DataFrame] | None = None


class GoldLayer:
    def __init__(self) -> None:
        self._tables: dict[str, GoldTable] = {}

    def register(self, table: GoldTable) -> None:
        if table.name in self._tables:
            raise ValueError(f"duplicate gold table {table.name!r}")
        self._tables[table.name] = table

    def refresh(self, spark: SparkSession, name: str, incremental: bool = False) -> None:
        """Rebuild one gold table atomically (temp dir + rename-by-path).

        Readers keep a consistent view: parquet readers resolve files at
        plan time, and the swap is a metadata operation. On object
        stores use a format with atomic commits (Delta/Iceberg) instead.

        With ``incremental=True`` (and a registered roll-forward) the
        previous snapshot seeds the new one; the staging write
        materializes the read of the old files before the swap replaces
        them. Falls back to the full builder when no snapshot exists.
        """
        t = self._tables[name]
        tmp = f"{t.path}__staging"
        if incremental and t.incremental is not None and self._exists(spark, t.path):
            df = t.incremental(spark, spark.read.parquet(t.path))
        else:
            df = t.builder(spark)
        df.write.mode("overwrite").parquet(tmp)
        # rename-aside swap (sources.merge): delete-then-rename would
        # leave NO table at all if the process dies between the two —
        # the swap keeps either the old snapshot or the new one.
        from ..sources.merge import replace_dir

        replace_dir(spark, tmp, t.path)

    @staticmethod
    def _exists(spark: SparkSession, path: str) -> bool:
        from ..sources.merge import path_exists

        return path_exists(spark, path)

    def refresh_all(self, spark: SparkSession) -> None:
        for name in self._tables:
            self.refresh(spark, name)

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.read.parquet(self._tables[name].path)
