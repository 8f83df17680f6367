"""Custom Structured Streaming block source (SURVEY.md §2.A A1/A2/A4).

The reference subscribes to Tendermint ``NewBlock`` over WebSocket and
feeds heights into a bounded mpsc channel of 64 (`provider/event.rs:
80-152`); a consumer paces one block at a time with retry/backoff
(`event.rs:157-205`) and backfill splits missing ranges across
``sync_threads`` workers (`synchronization.rs:85-136`). Round 1 stood
this in with file/rate sources; this module closes the gap with a REAL
Spark source: a Python DataSource (Spark 4 ``pyspark.sql.datasource``)
whose offsets ARE block heights.

Semantics mapped onto Spark's streaming contract:

- **Offset = delivered block height.** ``initialOffset`` starts at
  ``start_block``; ``latestOffset`` polls the landing directory for the
  current chain head but advances at most ``blocks_per_batch`` heights
  per trigger — the bounded-channel backpressure (64 by default, the
  reference's channel size). Exactly-once replay across restart comes
  from Spark's offset checkpointing instead of the reference's
  per-block DB transaction + block-ledger row (A5).
- **Partitioned range replay (A4).** Each microbatch's (lo, hi] height
  range splits into ``num_partitions`` contiguous sub-ranges — the
  ``sync_threads`` fan-out, but scheduled by Spark with task retry
  (the A2 retry/backoff analog) instead of hand-rolled tokio tasks.
- **Landing contract.** A producer (the out-of-engine WS/gRPC edge,
  SURVEY §2.A A3) appends bronze event rows (schemas.BRONZE_EVENT) as
  parquet under ``path``; this source tails it by height. Files may
  arrive in any order; only rows with ``block`` in the triggered range
  are emitted, so a late file for an already-committed height is
  surfaced by the gap scan (operators/gaps.py) — the same division of
  labor as the reference's live-vs-backfill split.

Readers filter row groups with parquet statistics (``filters=`` hands
the height predicate to pyarrow), so a height-sorted landing zone reads
O(matching row groups), not O(files) — at scale, compact the landing
dir by height range exactly like the reference's block table is
b-tree-indexed by id.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence
from datetime import timezone
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import DataSource, DataSourceStreamReader, InputPartition
from pyspark.sql.types import StructType

# Mirrors schemas.BRONZE_EVENT; drift is pinned by tests/test_blockfeed.py.
_SCHEMA_DDL = (
    "block bigint, tx_hash string, event_index int, event_type string, "
    "timestamp timestamp, attributes map<string,string>"
)


@dataclass
class _Range(InputPartition):
    path: str
    lo: int  # exclusive
    hi: int  # inclusive


def _landing_files(path: str) -> list[str]:
    """Visible parquet files of the landing zone, walked with Spark/
    Hadoop staging dirs pruned (``_temporary``, ``_spark_metadata``,
    dot-files). ``pyarrow.dataset`` discovery recurses into an in-flight
    writer's ``_temporary`` tree and crashes when the committer renames
    it away mid-listing (observed as a latestOffset FileNotFoundError
    racing a concurrent ``df.write.parquet`` into the landing dir) —
    walking ourselves prunes those subtrees before ever listing them,
    and a vanished leaf dir is skipped, not fatal.

    Local-filesystem only by design: the landing zone is the edge
    host's disk (ARCHITECTURE.md landing-zone section — the whole
    compaction protocol assumes POSIX atomic rename). ``os.walk`` on an
    object-store URI would silently yield nothing and the stream would
    stall headless, so a URI scheme is rejected loudly instead."""
    import os
    import re

    if re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://", path):
        raise ValueError(
            f"blockfeed landing path must be a local filesystem path, got {path!r}: "
            "the landing protocol (os.walk listing + atomic-rename compaction) "
            "assumes POSIX semantics; stage object-store data to local disk or "
            "read it with spark.readStream.parquet instead"
        )
    files: list[str] = []
    for root, dirs, names in os.walk(path, onerror=lambda _e: None):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        files.extend(
            os.path.join(root, n)
            for n in names
            if n.endswith(".parquet") and not n.startswith(("_", "."))
        )
    return sorted(files)


def _head(path: str) -> int | None:
    """Current chain head: max block height in the landing dir, from
    parquet footer statistics only (no row reads on the driver poll).

    Retries once on FileNotFoundError: a listed file can vanish between
    the walk and its footer read when compaction unlinks the per-block
    originals it just merged (their heights stay visible through the
    merged blocks_* file on the re-list)."""
    import pyarrow.dataset as ds

    for attempt in (0, 1):
        files = _landing_files(path)
        if not files:
            return None
        head: int | None = None
        try:
            # dataset() itself validates the file list and opens the
            # first footer — it must sit inside the retry too
            dataset = ds.dataset(files, format="parquet")
            for frag in dataset.get_fragments():
                for rg in frag.row_groups:
                    stats = rg.statistics or {}
                    mx = (stats.get("block") or {}).get("max")
                    if mx is not None:
                        head = mx if head is None else max(head, mx)
        except FileNotFoundError:
            if attempt:
                raise
            continue
        return head
    return None  # pragma: no cover - loop always returns/raises


class _BlockFeedReader(DataSourceStreamReader):
    def __init__(self, options: dict[str, str]) -> None:
        self._path = options["path"]
        self._start = int(options.get("start_block", "0"))
        self._per_batch = int(options.get("blocks_per_batch", "64"))
        self._parts = int(options.get("num_partitions", "4"))
        if self._per_batch < 1 or self._parts < 1:
            raise ValueError("blocks_per_batch and num_partitions must be >= 1")

    def initialOffset(self) -> dict:
        return {"block": self._start}

    def latestOffset(self) -> dict:
        """Monotone paced head.

        First poll of a (re)started query returns the TRUE head — one
        partitioned catch-up batch covering everything pending, the
        reference's on-reconnect backfill sweep (`synchronization.rs:
        169-188` spawns start_sync on every WS reconnect). After that,
        steady state advances at most ``blocks_per_batch`` heights per
        trigger — the bounded-channel backpressure (the reference's
        mpsc of 64). Monotonicity matters: the reader cannot see the
        checkpointed offset, so a paced value computed from scratch
        could land BELOW it and corrupt the offset log with a
        backward step; catching up to head first (append-only landing
        => head >= committed) makes every later paced value safe.
        """
        head = _head(self._path)
        base = self._start if head is None else max(head, self._start)
        last = getattr(self, "_last_end", None)
        if last is None:
            end = base
        else:
            end = min(base, last + self._per_batch) if base > last else last
        self._last_end = end
        return {"block": end}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        lo, hi = int(start["block"]), int(end["block"])
        if hi <= lo:
            return [_Range(self._path, lo, hi)]
        n = min(self._parts, hi - lo)
        step = (hi - lo) // n
        bounds = [lo + i * step for i in range(n)] + [hi]
        return [_Range(self._path, bounds[i], bounds[i + 1]) for i in range(n)]

    def read(self, partition: _Range) -> Iterator[tuple]:
        if partition.hi <= partition.lo:
            return
        import pyarrow.dataset as ds

        # Same pruned listing as the driver poll: never descend into a
        # concurrent writer's _temporary staging tree. Retry semantics
        # (round-8 ADVICE fix, refined by review): a restart is
        # duplicate-free ONLY while nothing has been yielded — a
        # generator that restarts mid-stream re-yields every row already
        # emitted INTO THE SAME task attempt's output (strictly weaker
        # than a Spark task retry, which discards the failed attempt
        # entirely). So the one in-process retry is gated on
        # zero-rows-yielded — which still covers the observed race
        # (compaction unlinks a listed original while dataset() opens
        # footers, i.e. before the first batch) — and a mid-stream
        # FileNotFoundError propagates to Spark's task retry (read()
        # re-lists on the fresh attempt; the merged blocks_* file
        # carries the vanished rows). Note local[n] masters default to
        # maxFailures=1 — co-locating compaction with a live local-mode
        # reader needs master "local[n,2]" or a quiesced compactor for
        # the mid-stream case. Batches stream; nothing buffers the range.
        yielded = False
        for attempt in (0, 1):
            files = _landing_files(partition.path)
            if not files:
                return
            try:
                dataset = ds.dataset(files, format="parquet")
                expr = (ds.field("block") > partition.lo) & (
                    ds.field("block") <= partition.hi
                )
                for batch in dataset.to_batches(filter=expr):
                    for row in batch.to_pylist():
                        attrs = row["attributes"]
                        if isinstance(attrs, list):  # pyarrow map -> [(k, v)]
                            attrs = dict(attrs)
                        ts = row["timestamp"]
                        # landing timestamps are UTC instants (session
                        # tz UTC); Spark's arrow converter requires
                        # tz-aware values.
                        if ts is not None and ts.tzinfo is None:
                            ts = ts.replace(tzinfo=timezone.utc)
                        yielded = True
                        yield (
                            row["block"],
                            row["tx_hash"],
                            row["event_index"],
                            row["event_type"],
                            ts,
                            attrs,
                        )
                return
            except FileNotFoundError:
                if attempt or yielded:
                    raise

    def commit(self, end: dict) -> None:
        # Offset durability lives in the query checkpoint; nothing to
        # acknowledge upstream (the landing dir is append-only).
        pass


class BlockFeedDataSource(DataSource):
    """``spark.readStream.format("blockfeed")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "blockfeed"

    def schema(self) -> str:
        return _SCHEMA_DDL

    def streamReader(self, schema: StructType) -> _BlockFeedReader:
        return _BlockFeedReader(self.options)


def register_blockfeed(spark: SparkSession) -> None:
    """Idempotently register the source with this session."""
    spark.dataSource.register(BlockFeedDataSource)


def subscribe_blocks(
    spark: SparkSession,
    path: str,
    start_block: int = 0,
    blocks_per_batch: int = 64,
    num_partitions: int = 4,
) -> DataFrame:
    """The A1 subscription as a streaming DataFrame of BRONZE_EVENT rows.

    Feed it to ``streaming.ingest.deduped_stream`` + ``foreachBatch``
    silver writes for the full reference live path.
    """
    register_blockfeed(spark)
    return (
        spark.readStream.format("blockfeed")
        .option("path", path)
        .option("start_block", str(start_block))
        .option("blocks_per_batch", str(blocks_per_batch))
        .option("num_partitions", str(num_partitions))
        .load()
    )
