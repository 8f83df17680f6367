"""Stream-stream joins: watermarked interval enrichment.

The reference enriches each event with an as-of price by querying
Postgres at handle time (`handler/wasm_ls_open.rs:63-97` — a lookup per
event). The streaming-native equivalent joins the *event stream* against
the *price-tick stream* directly: both sides watermarked, the join
condition an equi-key plus an event-time interval, so Spark can bound
both join-state stores and emit matches incrementally (the
stream-stream join design from the Structured Streaming paper,
SIGMOD'18).

Scale: state per side is (watermark horizon × arrival rate) rows, keyed
by the join key — independent of total history. The interval condition
is what makes the state prunable: without a time bound Spark must keep
every past row of both streams forever.

Emission semantics differ from the batch as-of join on purpose: the
join emits EVERY price tick inside the tolerance window (a standard
interval join), not just the latest-before-event. Downstream either
aggregates (e.g. min price age) or accepts tick granularity. Collapsing
to exactly-the-latest in-stream would need a per-event aggregation
after the join — legal in Spark 4 (chained stateful operators) but it
delays emission to watermark expiry; batch reconciliation (the asof
operator) remains the authority, same split as ingest dedup vs batch
anti-join.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def interval_join(
    events: DataFrame,
    ticks: DataFrame,
    keys: Sequence[str],
    event_ts: str = "timestamp",
    tick_ts: str = "price_ts",
    tolerance: str = "10 minutes",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join each event to every tick with ``tick_ts`` in
    ``[event_ts − tolerance, event_ts]`` on the shared ``keys``.

    Works on streaming *and* batch frames (one code path, testable by
    equivalence). ``how='left_outer'`` emits null-tick rows for events
    with no tick in the window — in streaming these surface only once
    the watermark passes the event, so late ticks can't invalidate
    them.
    """
    if event_ts == tick_ts:
        raise ValueError("event and tick timestamp columns must be named apart")
    left = events
    right = ticks
    if left.isStreaming:
        left = left.withWatermark(event_ts, watermark)
    if right.isStreaming:
        right = right.withWatermark(tick_ts, watermark)
    l, r = left.alias("l"), right.alias("r")
    cond = F.lit(True)
    for k in keys:
        cond = cond & (F.col(f"l.{k}") == F.col(f"r.{k}"))
    cond = (
        cond
        & (F.col(f"r.{tick_ts}") <= F.col(f"l.{event_ts}"))
        & (
            F.col(f"r.{tick_ts}")
            >= F.col(f"l.{event_ts}") - F.expr(f"INTERVAL {tolerance}")
        )
    )
    joined = l.join(r, cond, how)
    drop = [F.col(f"r.{k}") for k in keys]
    return joined.drop(*drop)
