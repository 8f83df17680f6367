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

import json
import queue
import threading
import time
import uuid
from collections.abc import Callable, Iterator, Mapping, Sequence
from dataclasses import dataclass, field
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


def iter_heights(ws: WSClient) -> Iterator[int]:
    """Yield block heights from NewBlock event messages until close.

    Non-NewBlock messages and events missing block data are skipped
    (`event.rs:122-137` does the same), so a mixed subscription never
    wedges the producer.
    """
    while True:
        try:
            msg = ws.recv()
        except WSClosed:
            return
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
    indexers finish them), retries with increasing backoff
    (``backoff * attempt`` seconds, `event.rs:178`), skips a block
    after ``max_retries`` failed attempts, and aborts the session once
    ``breaker_threshold`` consecutive blocks are skipped. Returns when
    the peer closes the socket (reconnect policy — the reference's
    outer ``loop { ... sleep(reconnect_interval) }`` — belongs to the
    supervisor calling this in a loop; on reconnect, the gap scan +
    batch backfill path reconciles anything missed, A4).
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
                except Exception as exc:  # skipped after max_retries
                    stats.skipped.append(height)
                    try:
                        breaker.fail(exc)
                    except ConnectionError:
                        stats.aborted = True
                        return
                    continue
                land_block(landing_dir, height, rows)
                stats.delivered.append(height)
                breaker.ok()
        finally:
            consumer_dead.set()

    consumer = threading.Thread(target=consume, name="block-consumer", daemon=True)
    consumer.start()

    ws = WSClient(ws_url, timeout=ws_timeout)
    try:
        subscribe(ws, query)
        for height in iter_heights(ws):
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
