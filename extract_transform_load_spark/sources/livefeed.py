"""Live block feed edge: WS ``NewBlock`` subscription → bounded queue →
retried block fetch → parquet landing zone (SURVEY.md §2.A A1/A2/A3).

This is the producer side of the live path whose Spark side is
``sources/blockfeed.py``: the reference subscribes to Tendermint
``NewBlock`` events over WebSocket, feeds heights into a bounded mpsc
channel of 64, and a consumer processes one block at a time with a
propagation delay, 3 retries with increasing backoff, and a
circuit breaker that aborts after 10 consecutive block failures
(`provider/event.rs:20-29,80-205`). Here that loop is plain Python on
the stdlib WebSocket client (`sources/ws.py`), and "process block"
means: fetch the block's events (any callable — an HTTP JSON-RPC
fetcher in production, a fake in tests) and append them as one bronze
parquet file to the landing directory that ``subscribe_blocks`` tails.

Division of labor at scale: this edge process is intentionally tiny
and stateless — all durability lives in the landing zone (append-only
parquet) and Spark's offset checkpoint. Run one producer per chain;
the landing dir should be periodically compacted by height range so
the blockfeed source's footer-statistics pruning stays O(matching row
groups) (see `blockfeed.py` module notes).

Wire protocol (public Tendermint RPC surface): subscribe request is
JSON-RPC 2.0 ``{"method": "subscribe", "params": {"query":
"tm.event='NewBlock'"}}``; each event message carries the block height
at ``result.data.value.block.header.height`` (a decimal string).
"""

from __future__ import annotations

import contextlib
import json
import queue
import random
import threading
import time
import uuid
from collections.abc import Callable, Iterator, Mapping, Sequence
from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone
from pathlib import Path

from .ws import CircuitBreaker, WSClient, WSClosed, with_retry

NEW_BLOCK_QUERY = "tm.event='NewBlock'"

# `event.rs:20-29` — the reference's pacing/abort constants.
BLOCK_PROPAGATION_DELAY = 1.0
BLOCK_MAX_RETRIES = 3
MAX_CONSECUTIVE_FAILURES = 10
CHANNEL_SIZE = 64

# A bronze event row, keyed exactly like schemas.BRONZE_EVENT:
# (block, tx_hash, event_index, event_type, timestamp_utc_micros, attributes)
BronzeRow = tuple[int, str, int, str, int, Mapping[str, str]]

# fetch_block(height) -> bronze rows for that block. Production: HTTP
# JSON-RPC `block_results` + tx event decode (pipeline/rawtx.py); tests
# inject a fake. Raise to signal a fetch failure (retried, then counted
# by the circuit breaker).
BlockFetcher = Callable[[int], Sequence[BronzeRow]]


def subscribe(ws: WSClient, query: str = NEW_BLOCK_QUERY, req_id: int = 1) -> None:
    """Send the JSON-RPC subscribe frame and consume its ack.

    Tendermint acks a subscription with an empty ``result`` before any
    event arrives; surfacing a non-ack reply (e.g. an error object) here
    beats misparsing it later as an event.
    """
    ws.send_text(
        json.dumps(
            {
                "jsonrpc": "2.0",
                "method": "subscribe",
                "id": req_id,
                "params": {"query": query},
            }
        )
    )
    ack = json.loads(ws.recv())
    if "error" in ack:
        raise ConnectionError(f"subscribe rejected: {ack['error']}")


def iter_heights(ws: WSClient, stop: threading.Event | None = None) -> Iterator[int]:
    """Yield block heights from NewBlock event messages until close.

    Non-NewBlock messages and events missing block data are skipped
    (`event.rs:122-137` does the same), so a mixed subscription never
    wedges the producer. ``stop`` ends the iteration at the next recv
    timeout — without it, a session whose consumer has died during a
    QUIET stretch of the feed would ping forever (the reference notices
    through the failed channel send, `event.rs:141-148`; a send only
    happens when a height arrives, so the timeout is the quiet-path
    check).
    """
    while True:
        try:
            msg = ws.recv()
        except WSClosed:
            return
        except TimeoutError:
            # Quiet-but-healthy feed: Tendermint blocks arrive ~6 s
            # apart, so a recv timeout at the default 5 s socket
            # timeout is routine, not a failure. Probe liveness with a
            # ping (the pong is consumed transparently by the next
            # recv) and keep waiting; a dead peer surfaces as OSError
            # on the ping send or WSClosed on the next recv.
            if stop is not None and stop.is_set():
                return
            try:
                ws.ping()
            except OSError:
                return
            continue
        try:
            data = json.loads(msg)
        except ValueError:
            continue
        value = ((data.get("result") or {}).get("data") or {}).get("value") or {}
        header = (value.get("block") or {}).get("header") or {}
        height = header.get("height")
        if height is None:
            continue
        yield int(height)


def land_block(landing_dir: str, height: int, rows: Sequence[BronzeRow]) -> str:
    """Append one block's bronze rows as a parquet file the blockfeed
    source (and plain ``spark.read.parquet``) can read.

    pyarrow, not Spark: the edge producer must not need a JVM. The
    filename embeds the height so operators can eyeball/compact the
    landing zone by range; uniqueness comes from the uuid suffix (a
    replayed block lands twice and is collapsed by the stream's
    PK dedup / the batch anti-join, per the A5 idempotency contract).
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pa.schema(
        [
            ("block", pa.int64()),
            ("tx_hash", pa.string()),
            ("event_index", pa.int32()),
            ("event_type", pa.string()),
            ("timestamp", pa.timestamp("us", tz="UTC")),
            ("attributes", pa.map_(pa.string(), pa.string())),
        ]
    )
    cols = list(zip(*rows)) if rows else [[], [], [], [], [], []]
    table = pa.Table.from_arrays(
        [
            pa.array(cols[0], pa.int64()),
            pa.array(cols[1], pa.string()),
            pa.array(cols[2], pa.int32()),
            pa.array(cols[3], pa.string()),
            pa.array(cols[4], pa.timestamp("us", tz="UTC")),
            pa.array([list(dict(a).items()) for a in cols[5]], pa.map_(pa.string(), pa.string())),
        ],
        schema=schema,
    )
    out = Path(landing_dir) / f"block_{height:012d}_{uuid.uuid4().hex[:8]}.parquet"
    pq.write_table(table, out)
    return str(out)


@dataclass
class FeedStats:
    """Session outcome — what `event.rs` logs, surfaced as data."""

    delivered: list[int] = field(default_factory=list)
    skipped: list[int] = field(default_factory=list)
    aborted: bool = False  # circuit breaker opened
    error: str | None = None  # unexpected consumer death (supervisor signal)


def run_live_session(
    ws_url: str,
    fetch_block: BlockFetcher,
    landing_dir: str,
    *,
    query: str = NEW_BLOCK_QUERY,
    propagation_delay: float = BLOCK_PROPAGATION_DELAY,
    max_retries: int = BLOCK_MAX_RETRIES,
    backoff: float = 2.0,
    breaker_threshold: int = MAX_CONSECUTIVE_FAILURES,
    channel_size: int = CHANNEL_SIZE,
    ws_timeout: float = 5.0,
) -> FeedStats:
    """One WebSocket session: subscribe, stream heights, land blocks.

    Faithful to `event.rs:run_session`: the producer (this thread)
    feeds a bounded queue — when the consumer falls behind, ``put``
    blocks, which stops reading the socket: TCP backpressure, the same
    effect as the reference's bounded mpsc. The consumer thread paces
    each block with ``propagation_delay`` (WS announces blocks before
    indexers finish them), retries with exponential backoff
    (``backoff * 2**attempt`` seconds — the reference paces linearly,
    ``backoff * attempt`` at `event.rs:178`; exponential is the
    deliberate departure here, gentler on a struggling RPC node), skips
    a block after ``max_retries`` failed attempts, and aborts the
    session once ``breaker_threshold`` consecutive blocks are skipped.
    Landing failures (disk full, bad ``landing_dir``) go through the
    same retry + breaker path as fetch failures, so a persistent sink
    problem aborts the session instead of silently dropping heights.
    Returns when the peer closes the socket (reconnect policy — the
    reference's outer ``loop { ... sleep(reconnect_interval) }`` — is
    :func:`run_supervised`; on reconnect, the gap scan + backfill path
    reconciles anything missed, A4). Any unexpected consumer death is
    recorded in ``stats.error`` so the supervisor can distinguish it
    from a clean peer close.
    """
    heights: queue.Queue[int | None] = queue.Queue(maxsize=channel_size)
    stats = FeedStats()
    consumer_dead = threading.Event()

    def consume() -> None:
        breaker = CircuitBreaker(breaker_threshold)
        try:
            while True:
                height = heights.get()
                if height is None:
                    return
                if propagation_delay:
                    time.sleep(propagation_delay)
                try:
                    rows = with_retry(
                        lambda h=height: fetch_block(h),
                        retries=max_retries - 1,
                        backoff=backoff,
                        retryable=(Exception,),
                    )
                    # landing shares the retry/breaker path: a sink
                    # failure is a block failure, not a silent drop
                    with_retry(
                        lambda h=height, r=rows: land_block(landing_dir, h, r),
                        retries=max_retries - 1,
                        backoff=backoff,
                        retryable=(Exception,),
                    )
                except Exception as exc:  # skipped after max_retries
                    stats.skipped.append(height)
                    try:
                        breaker.fail(exc)
                    except ConnectionError:
                        stats.aborted = True
                        return
                    continue
                stats.delivered.append(height)
                breaker.ok()
        except BaseException as exc:  # pragma: no cover — defensive
            stats.error = repr(exc)
            raise
        finally:
            consumer_dead.set()

    consumer = threading.Thread(target=consume, name="block-consumer", daemon=True)
    consumer.start()

    ws = WSClient(ws_url, timeout=ws_timeout)
    try:
        subscribe(ws, query)
        for height in iter_heights(ws, stop=consumer_dead):
            # Dead consumer (breaker open) => end the session cleanly,
            # like the reference's failed channel send (`event.rs:141-148`).
            while not consumer_dead.is_set():
                try:
                    heights.put(height, timeout=0.1)
                    break
                except queue.Full:
                    continue
            if consumer_dead.is_set():
                break
    finally:
        # Guaranteed cleanup, in the reference's order: close the
        # socket, then drain/join the consumer. The sentinel put loops
        # on Full so a backed-up queue still gets it once the consumer
        # drains (or dies — consumer_dead breaks the loop either way).
        ws.close()
        while not consumer_dead.is_set():
            try:
                heights.put(None, timeout=0.1)
                break
            except queue.Full:
                continue
        consumer_dead.wait(timeout=30)
        consumer.join(timeout=30)
    return stats


# -- reconnect supervisor + gap reconciliation (A4) -----------------------


def landing_heights(landing_dir: str) -> list[int]:
    """Sorted distinct heights present in the landing zone.

    Two sources, no data reads — the edge process stays JVM- and
    IO-light, and a directory listing is exactly what the reference's
    ``block``-table id scan is to Postgres (`dao/postgre/block.rs:29-74`):

    - the filename contract of live landings
      (``block_{height:012d}_{uuid}.parquet``, :func:`land_block`);
    - the manifest sidecars of compacted range files
      (``.blocks_{lo}_{hi}_{uuid}.manifest.json``, hidden so Spark's
      and pyarrow's dataset listings skip them,
      :func:`compact_landing`) — contiguous height runs, exact even
      when the compacted range itself contains gaps.

    Other files are ignored. At multi-year scale, switch the gap math
    to run-lists instead of materialized ints; the edge's working set
    is the reference's last-100k window (`synchronization.rs:42-52`).
    """
    out: set[int] = set()
    base = Path(landing_dir)
    for p in base.glob("block_*.parquet"):
        parts = p.stem.split("_")
        if len(parts) >= 2:
            try:
                out.add(int(parts[1]))
            except ValueError:
                continue
    for m in base.glob(".blocks_*.manifest.json"):
        try:
            doc = json.loads(m.read_text())
        except ValueError:
            continue
        for lo, hi in doc.get("runs", []):
            out.update(range(int(lo), int(hi) + 1))
    return sorted(out)


def _runs(heights: Sequence[int]) -> list[list[int]]:
    """Contiguous [lo, hi] runs of a sorted distinct height list."""
    runs: list[list[int]] = []
    for h in heights:
        if runs and h == runs[-1][1] + 1:
            runs[-1][1] = h
        else:
            runs.append([h, h])
    return runs


def compact_landing(
    landing_dir: str,
    min_files: int = 16,
    row_group_size: int = 131_072,
) -> str | None:
    """Merge the per-block landing files into ONE height-sorted range
    file + a manifest sidecar; returns the new parquet path (None if
    fewer than ``min_files`` block files exist).

    Why: the blockfeed source prunes by parquet footer statistics, so
    its cost is O(files + matching row groups) — a long-running feed
    landing one file per block (the reference's one-DB-transaction-per-
    block, `event_dispatch.rs:193-244`) degrades the Spark side's poll
    and scan. Compaction restores O(matching row groups): heights are
    sorted, so each row group covers one narrow height band and the
    source's ``block`` filter skips the rest. ``row_group_size`` trades
    pruning granularity against footer size.

    Crash-safety is the A5 idempotency contract, not atomicity: the
    merged file is written first, the manifest second, inputs unlinked
    last. A crash between steps leaves duplicate ROWS (collapsed by the
    stream's PK dedup / batch anti-join, like any replayed block) but
    never loses a height — `landing_heights` unions filenames and
    manifests. The manifest records the exact contiguous runs merged,
    so a gap inside the compacted range stays visible to the gap scan.

    JVM-free (pyarrow), like the rest of the edge process.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = Path(landing_dir)
    files: list[tuple[int, Path]] = []
    for p in base.glob("block_*.parquet"):
        parts = p.stem.split("_")
        if len(parts) >= 2:
            try:
                files.append((int(parts[1]), p))
            except ValueError:
                continue
    if len(files) < min_files:
        return None
    files.sort()
    heights = sorted({h for h, _ in files})
    lo, hi = heights[0], heights[-1]
    tag = uuid.uuid4().hex[:8]
    out = base / f"blocks_{lo:012d}_{hi:012d}_{tag}.parquet"
    # Stream height-sorted inputs through a bounded buffer instead of
    # materializing the whole landing dir at once (a long-uncompacted
    # dir would otherwise spike the edge process's memory by its full
    # size). The buffer flushes as ONE row group each time it crosses
    # ``row_group_size`` rows — groups are ~row_group_size, flushed on
    # per-block file boundaries, so a single oversized input file can
    # make a group larger; footer pruning only needs groups to be
    # bounded-ish, not exact. Written to a dot-prefixed temp name and
    # renamed on success (round-7 ADVICE fix): a mid-stream crash must
    # not leave a visible half-compacted blocks_* file next to the
    # still-present originals — listings would then double-count every
    # row already copied. Hidden files are skipped by Spark/pyarrow
    # dataset listings, and the rename is atomic on one filesystem.
    tmp = base / f".{out.name}.inprogress"
    # A hard crash (SIGKILL, power loss) skips the except-path unlink,
    # and later runs use fresh uuid tags — sweep stale temps from dead
    # attempts so orphaned hidden parquet can't accumulate on the edge
    # host (the visible landing files a temp copied from are still
    # present, so deleting one never loses data). Age-gated: a temp
    # younger than stale_temp_age may belong to a compactor that is
    # STILL RUNNING (overlapping invocations), and unlinking a live
    # temp would crash it at its rename. mtime refreshes on every row
    # group flush, so any genuinely in-flight run keeps its temp fresh.
    import time as _time

    stale_temp_age = 3600.0
    now = _time.time()
    for stale in base.glob(".blocks_*.parquet.inprogress"):
        try:
            if now - stale.stat().st_mtime > stale_temp_age:
                stale.unlink(missing_ok=True)
        except OSError:
            pass  # vanished or unreadable: nothing to sweep
    writer = None
    buffer: list[pa.Table] = []
    buffered = 0
    total_rows = 0
    try:
        for _, p in files:
            t = pq.read_table(p)
            buffer.append(t)
            buffered += t.num_rows
            total_rows += t.num_rows
            if writer is None:
                writer = pq.ParquetWriter(tmp, t.schema)
            if buffered >= row_group_size:
                writer.write_table(pa.concat_tables(buffer), row_group_size=buffered)
                buffer, buffered = [], 0
        if buffer:
            if writer is None:  # zero-row landing files only
                writer = pq.ParquetWriter(tmp, buffer[0].schema)
            writer.write_table(pa.concat_tables(buffer), row_group_size=buffered or 1)
    except BaseException:
        # close() itself can raise on the error path (e.g. ENOSPC while
        # flushing the footer) — suppress it so the temp is ALWAYS
        # unlinked and the original exception propagates un-masked
        # (round-8 ADVICE fix).
        if writer is not None:
            with contextlib.suppress(Exception):
                writer.close()
        tmp.unlink(missing_ok=True)
        raise
    else:
        if writer is not None:
            writer.close()
            tmp.rename(out)
    # leading dot: parquet dataset listings (Spark, pyarrow) skip
    # hidden files, so the sidecar never confuses a reader
    manifest = base / f".blocks_{lo:012d}_{hi:012d}_{tag}.manifest.json"
    manifest.write_text(json.dumps({"runs": _runs(heights), "rows": total_rows}))
    for _, p in files:
        p.unlink()
    return str(out)


def missing_heights(heights: Sequence[int], scan_window: int | None = None) -> list[int]:
    """Gaps in a sorted height list — the driver-side twin of
    ``operators/gaps.py::find_gaps`` (same LEAD-window semantics,
    `block.rs:29-74`), sized for the edge process where the ledger is a
    directory listing, not a DataFrame.

    ``scan_window`` bounds the scan to the last N heights — the
    reference scans the full ledger at startup and only the last 100k
    blocks afterwards (`synchronization.rs:42-52`).
    """
    hs = sorted(set(heights))
    if scan_window is not None and hs:
        lo = hs[-1] - scan_window
        hs = [h for h in hs if h >= lo]
    out: list[int] = []
    for prev, nxt in zip(hs, hs[1:]):
        if nxt > prev + 1:
            out.extend(range(prev + 1, nxt))
    return out


def reconcile_gaps(
    landing_dir: str,
    fetch_block: BlockFetcher,
    *,
    scan_window: int | None = None,
    max_retries: int = BLOCK_MAX_RETRIES,
    backoff: float = 2.0,
    head: int | None = None,
) -> tuple[list[int], list[int]]:
    """Backfill every missing height in the landing zone; returns
    (backfilled, failed) height lists.

    The reference spawns ``start_sync`` on every WS (re)connect
    (`synchronization.rs:169-188`) — gap scan, then range replay. Here
    the replay is sequential (the edge is one process; the PARALLEL
    range replay at scale is the Spark blockfeed source's partitioned
    catch-up batch, `blockfeed.py`), and each height gets the same
    retry envelope as the live path. Failures don't raise: a height
    that can't be fetched now stays missing and the next reconnect
    retries it.

    ``head`` closes the TAIL hole the internal gap scan can't see: the
    reference also backfills (last_landed+1, chain_head+1) on every
    reconnect (`synchronization.rs:60-68`). Heights missed DURING a
    disconnect sit past the last landed height, so without the head
    bound they only become an internal gap after the next session lands
    its first block — a long-lived session would leave them missing
    indefinitely. With ``head`` set they are fetched now. An empty
    landing zone ignores ``head`` (nothing to anchor the range; first
    connect is the full-history case the live session itself covers).
    """
    done: list[int] = []
    failed: list[int] = []
    landed = landing_heights(landing_dir)
    targets = missing_heights(landed, scan_window)
    if head is not None and landed and head > landed[-1]:
        targets.extend(range(landed[-1] + 1, head + 1))
    for h in targets:
        try:
            rows = with_retry(
                lambda hh=h: fetch_block(hh),
                retries=max_retries - 1,
                backoff=backoff,
                retryable=(Exception,),
            )
            with_retry(
                lambda hh=h, r=rows: land_block(landing_dir, hh, r),
                retries=max_retries - 1,
                backoff=backoff,
                retryable=(Exception,),
            )
            done.append(h)
        except Exception:
            failed.append(h)
    return done, failed


def run_supervised(
    ws_url: str,
    fetch_block: BlockFetcher,
    landing_dir: str,
    *,
    reconnect_interval: float = 5.0,
    max_sessions: int | None = None,
    max_wall: float | None = None,
    reconnect_jitter: float = 0.0,
    stop: threading.Event | None = None,
    scan_window: int | None = 100_000,
    fetch_head: Callable[[], int] | None = None,
    rng: random.Random | None = None,
    **session_kwargs,
) -> list[FeedStats]:
    """The reference's outer session loop (`event.rs:40-64`): reconcile
    gaps, run one WS session, sleep, reconnect — until ``stop`` is set,
    ``max_sessions`` sessions have run, ``max_wall`` seconds have
    elapsed, or the circuit breaker aborts (the reference's
    process-level abort, `event.rs:20-29`).

    Gap reconciliation runs BEFORE each session: full scan on the first
    connect, last-``scan_window`` heights after, exactly the reference's
    full-then-100k policy (`synchronization.rs:42-52`). When
    ``fetch_head`` is given, each reconciliation also backfills
    last_landed+1..head — the reference's tail backfill
    (`synchronization.rs:60-68`) — so heights missed during the
    disconnect land NOW rather than at the next-plus-one reconnect; a
    failing head probe degrades to internal-gap-only reconciliation
    (the next reconnect retries). A connect failure counts as a session
    with ``error`` set and is retried after the reconnect sleep like
    any other session end.

    The reconnect sleep is ``reconnect_interval`` plus up to
    ``reconnect_jitter`` fraction of uniform jitter — a deliberate
    departure from the reference's FIXED interval (`event.rs:46-52`):
    a fleet of edge processes restarted together (deploy, RPC-node
    blip) would otherwise reconnect in lockstep and thundering-herd
    the node; jitter decorrelates them. ``reconnect_jitter=0``
    reproduces the reference exactly. ``max_wall`` bounds total
    wall-clock for the whole loop (checked between sessions; a session
    in flight is never interrupted), the long-haul guard a
    crash-looping endpoint needs so the supervisor can't spin forever
    under an orchestrator that only restarts LIVE processes.

    ``session_kwargs`` pass through to :func:`run_live_session`
    (``propagation_delay``, ``max_retries``, ``breaker_threshold``...).
    """
    rng = rng or random.Random()
    t_start = time.monotonic()
    sessions: list[FeedStats] = []
    first = True
    while (
        (max_sessions is None or len(sessions) < max_sessions)
        and (max_wall is None or time.monotonic() - t_start < max_wall)
        and not (stop is not None and stop.is_set())
    ):
        if not first:
            time.sleep(reconnect_interval * (1.0 + rng.uniform(0.0, reconnect_jitter)))
        head: int | None = None
        if fetch_head is not None:
            try:
                head = with_retry(
                    fetch_head,
                    retries=session_kwargs.get("max_retries", BLOCK_MAX_RETRIES) - 1,
                    backoff=session_kwargs.get("backoff", 2.0),
                    retryable=(Exception,),
                )
            except Exception:
                head = None  # degrade: internal gaps only, retry next time
        reconcile_gaps(
            landing_dir,
            fetch_block,
            scan_window=None if first else scan_window,
            max_retries=session_kwargs.get("max_retries", BLOCK_MAX_RETRIES),
            backoff=session_kwargs.get("backoff", 2.0),
            head=head,
        )
        first = False
        try:
            st = run_live_session(ws_url, fetch_block, landing_dir, **session_kwargs)
        except (OSError, ConnectionError) as exc:
            st = FeedStats(error=repr(exc))
        sessions.append(st)
        if st.aborted:
            break
    return sessions


def aggregate_stats(
    sessions: Sequence[FeedStats], max_listed_skips: int = 1000
) -> dict:
    """Machine-consumable rollup of a supervised run — what the ``live``
    CLI prints as its final JSON line, so an orchestrator can alert on
    skips/aborts without parsing log prose. ``skipped_heights`` lists at
    most ``max_listed_skips`` (lowest first) so a catastrophic feed
    can't turn the status line into a megabyte blob; ``skipped`` always
    carries the FULL count, and every skipped height stays visible to
    the gap scan regardless (it is simply missing from the landing
    zone)."""
    delivered = sorted({h for s in sessions for h in s.delivered})
    skipped = sorted({h for s in sessions for h in s.skipped})
    return {
        "sessions": len(sessions),
        "delivered": len(delivered),
        "skipped": len(skipped),
        "skipped_heights": skipped[:max_listed_skips],
        "aborted": any(s.aborted for s in sessions),
        "errors": [s.error for s in sessions if s.error],
        "min_height": delivered[0] if delivered else None,
        "max_height": delivered[-1] if delivered else None,
    }


# -- production fetcher: Tendermint HTTP JSON-RPC -------------------------


def bronze_rows_from_block_results(
    height: int, block: Mapping, block_results: Mapping
) -> list[BronzeRow]:
    """Convert public Tendermint RPC ``/block`` + ``/block_results``
    JSON into bronze event rows (pure function — the testable core of
    :func:`http_block_fetcher`).

    Event shape per the public RPC docs: ``txs_results[i].events[j]``
    with ``{"type": ..., "attributes": [{"key": ..., "value": ...}]}``;
    the block header carries the RFC 3339 timestamp. Attribute keys may
    arrive base64-coded on older chains — both forms are plain strings
    here; decode upstream if needed. Event indexes number events within
    the block across txs, matching the reference's per-block insert
    order (`event_dispatch.rs:193-244`).
    """
    header = (block.get("block") or {}).get("header") or {}
    ts_raw = header.get("time", "1970-01-01T00:00:00Z")
    # RFC 3339 with nanoseconds → truncate to microseconds for parquet
    ts_str = ts_raw.replace("Z", "+00:00")
    if "." in ts_str:
        head_part, _, rest = ts_str.partition(".")
        split = next((i for i, ch in enumerate(rest) if ch in "+-"), len(rest))
        frac = rest[:split][:6].ljust(6, "0")
        ts_str = f"{head_part}.{frac}{rest[split:]}"
    ts = datetime.fromisoformat(ts_str).astimezone(timezone.utc)
    # exact integer micros: float .timestamp() has ~0.2us resolution at
    # 2026 epochs, and int() truncation can land 1us off the RPC value
    micros = (ts - datetime(1970, 1, 1, tzinfo=timezone.utc)) // timedelta(
        microseconds=1
    )

    tx_hashes = (block.get("block") or {}).get("data", {}).get("txs") or []
    rows: list[BronzeRow] = []
    idx = 0
    for tx_i, txr in enumerate((block_results.get("txs_results") or []) or []):
        tx_hash = str(tx_hashes[tx_i]) if tx_i < len(tx_hashes) else f"tx{tx_i}"
        for ev in txr.get("events") or []:
            attrs = {
                str(a.get("key", "")): str(a.get("value", ""))
                for a in ev.get("attributes") or []
            }
            rows.append((height, tx_hash, idx, str(ev.get("type", "")), micros, attrs))
            idx += 1
    return rows


def http_block_fetcher(rpc_url: str, timeout: float = 10.0) -> BlockFetcher:
    """A :data:`BlockFetcher` over the public Tendermint HTTP JSON-RPC
    (``GET {rpc}/block?height=H`` + ``GET {rpc}/block_results?height=H``)
    — the production stand-in for the reference's gRPC fetch
    (`grpc.rs:212-257`), which is out of engine scope per SURVEY §2.A A3.
    Stdlib urllib only; retry/breaker wrapping belongs to the caller
    (the consumer loop already applies it).
    """
    from urllib.request import urlopen

    base = rpc_url.rstrip("/")

    def get(path: str) -> Mapping:
        with urlopen(f"{base}{path}", timeout=timeout) as resp:
            body = json.loads(resp.read().decode())
        if "error" in body:
            raise ConnectionError(f"rpc error on {path}: {body['error']}")
        return body.get("result") or body

    def fetch(height: int) -> list[BronzeRow]:
        block = get(f"/block?height={height}")
        results = get(f"/block_results?height={height}")
        return bronze_rows_from_block_results(height, block, results)

    return fetch


def http_head_fetcher(rpc_url: str, timeout: float = 10.0) -> Callable[[], int]:
    """Chain-head probe over the public Tendermint ``/status`` RPC
    (``sync_info.latest_block_height``) — feeds the supervisor's tail
    backfill (`synchronization.rs:60-68`). Same stdlib-only discipline
    as :func:`http_block_fetcher`; retries belong to the caller."""
    from urllib.request import urlopen

    base = rpc_url.rstrip("/")

    def head() -> int:
        with urlopen(f"{base}/status", timeout=timeout) as resp:
            body = json.loads(resp.read().decode())
        result = body.get("result") or body
        return int(result["sync_info"]["latest_block_height"])

    return head
