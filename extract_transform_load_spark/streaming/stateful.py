"""Custom stateful streaming operator: per-contract lease lifecycle.

The reference tracks lease lifecycle imperatively: each block's events
mutate per-contract rows — a contract opens with a loan, repayments run
the principal down, a close/liquidation terminates it
(`event_dispatch.rs:31-191`, `handler/ls_loan_closing.rs:359-802`), and
only *active* leases are snapshotted (`ls_state.rs:72-126`). The
streaming twin keeps that per-contract running state in the Structured
Streaming state store via ``applyInPandasWithState`` — arbitrary
stateful transitions (close-on-zero-principal) that built-in windowed
aggregates can't express.

Scale design (100 TB / 10^9 contracts):
- the stream shuffles ONCE onto the state-store partitioning
  (contract_id) and stays there across microbatches;
- per-key state is five scalars (O(1)); a billion open contracts is
  tens of GB spread over the cluster's state store (RocksDB-backed in
  production, in-memory HDFS-backed on local);
- an optional processing-time timeout evicts idle closed contracts so
  the store tracks only the open set — the same "active leases only"
  discipline as the reference's snapshot anti-join.

``positions_batch`` is the batch twin over the same event frame: the
final stream state must equal it exactly (tested in
tests/test_streaming_stateful.py). Order-independence argument: the
final principal is ``open − Σrepay`` regardless of arrival order, and
``status`` depends only on the final principal and whether a close
event exists, so the batch twin needs no ordering at all.
"""

from __future__ import annotations

from collections.abc import Iterator
from decimal import Decimal
from typing import Any

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import StatefulProcessor

#: input contract: one row per lease event
POSITION_EVENT = (
    "contract_id string, kind string, amount decimal(38,0), timestamp timestamp"
)

#: emitted per updated contract per microbatch
POSITION_STATE = (
    "contract_id string, opened_at timestamp, principal decimal(38,0), "
    "n_repayments int, status string, last_event_at timestamp"
)

# state-store layout: timestamps as epoch-micros longs, principal as a
# string (exact integer arithmetic without Arrow decimal round-trips),
# closed = sticky has-a-terminal-event-been-seen flag (status itself is
# DERIVED, never stored — see _status)
_STORE = "opened_us long, principal string, n_repayments int, closed boolean, last_us long"


def _us(ts: Any) -> int:
    return int(pd.Timestamp(ts).value // 1_000)


def _fold(
    pdfs: Iterator[pd.DataFrame],
    opened_us: int | None,
    principal: int,
    n_rep: int,
    closed: bool,
    last_us: int | None,
) -> tuple[int | None, int, int, bool, int | None]:
    """Apply a microbatch's events to one contract's state (shared by
    both stateful APIs).

    Fully ORDER-INDEPENDENT, matching positions_batch by construction:
    opened_at = min(open ts), principal = Σopen − Σrepay, closed is a
    sticky flag, last = max(ts). No per-chunk sorting — an order-
    sensitive fold would silently depend on Arrow chunking (a group's
    microbatch arrives as multiple pdfs split at maxRecordsPerBatch,
    and sorting each chunk independently is not a sort)."""
    for pdf in pdfs:
        for kind, amount, ts in zip(pdf["kind"], pdf["amount"], pdf["timestamp"]):
            us = _us(ts)
            if kind == "open":
                opened_us = us if opened_us is None else min(opened_us, us)
                principal += int(amount)
            elif kind == "repay":
                principal -= int(amount)
                n_rep += 1
            elif kind in ("close", "liquidation"):
                closed = True
            last_us = us if last_us is None else max(last_us, us)
    return opened_us, principal, n_rep, closed, last_us


def _status(opened_us: int | None, principal: int, closed: bool) -> str:
    """Derived exactly as positions_batch derives it (same precedence:
    never-opened is pending even when events exist)."""
    if opened_us is None:
        return "pending"
    if closed or principal <= 0:
        return "closed"
    return "open"


def _emit(
    contract_id: str,
    opened_us: int | None,
    principal: int,
    n_rep: int,
    closed: bool,
    last_us: int | None,
) -> pd.DataFrame:
    return pd.DataFrame(
        [
            {
                "contract_id": contract_id,
                "opened_at": pd.Timestamp(opened_us, unit="us")
                if opened_us is not None
                else None,
                "principal": Decimal(principal),
                "n_repayments": n_rep,
                "status": _status(opened_us, principal, closed),
                "last_event_at": pd.Timestamp(last_us, unit="us")
                if last_us is not None
                else None,
            }
        ]
    )


def track_positions(
    events: DataFrame, idle_timeout_ms: int | None = None
) -> DataFrame:
    """Streaming per-contract position tracker.

    Emits the contract's current state once per microbatch in which it
    received events (``update`` semantics). With ``idle_timeout_ms``,
    CLOSED contracts silent for that long are emitted one final time
    and evicted; idle OPEN/pending contracts keep their state (the
    timer re-arms silently) — evicting them would zero a live
    position.
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms
        else GroupStateTimeout.NoTimeout
    )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (contract_id,) = key
        if state.exists:
            opened_us, principal_s, n_rep, closed, last_us = state.get
            principal = int(principal_s)
        else:
            opened_us, principal, n_rep, closed, last_us = None, 0, 0, False, None

        if state.hasTimedOut:
            if _status(opened_us, principal, closed) == "closed":
                # idle CLOSED contract: final emission, then evict
                state.remove()
                yield _emit(contract_id, opened_us, principal, n_rep, closed, last_us)
            else:
                # an idle OPEN (or pending) contract keeps its principal
                # — evicting it would zero the position and corrupt the
                # next fold. Keep state, re-arm the timer, emit nothing.
                state.update((opened_us, str(principal), n_rep, closed, last_us))
                state.setTimeoutDuration(idle_timeout_ms)
            return

        opened_us, principal, n_rep, closed, last_us = _fold(
            pdfs, opened_us, principal, n_rep, closed, last_us
        )
        state.update((opened_us, str(principal), n_rep, closed, last_us))
        if idle_timeout_ms:
            state.setTimeoutDuration(idle_timeout_ms)
        yield _emit(contract_id, opened_us, principal, n_rep, closed, last_us)

    return (
        events.groupBy("contract_id")
        .applyInPandasWithState(update, POSITION_STATE, _STORE, "update", timeout)
    )


class PositionsProcessor(StatefulProcessor):
    """StatefulProcessor for Spark 4's ``transformWithStateInPandas``.

    Same semantics as the ``applyInPandasWithState`` tracker (both fold
    through :func:`_fold`, so the transition logic is literally shared).
    Module-level so the fold-through-fake-state unit test can drive it
    without a streaming query.
    """

    def __init__(self, state_ttl_ms: int | None = None) -> None:
        self._ttl = state_ttl_ms

    def init(self, handle: Any) -> None:
        self._state = handle.getValueState("position", _STORE, ttlDurationMs=self._ttl)

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues: Any
    ) -> Iterator[pd.DataFrame]:
        (contract_id,) = key
        if self._state.exists():
            opened_us, principal_s, n_rep, closed, last_us = self._state.get()
            principal = int(principal_s)
        else:
            opened_us, principal, n_rep, closed, last_us = None, 0, 0, False, None
        opened_us, principal, n_rep, closed, last_us = _fold(
            rows, opened_us, principal, n_rep, closed, last_us
        )
        self._state.update((opened_us, str(principal), n_rep, closed, last_us))
        yield _emit(contract_id, opened_us, principal, n_rep, closed, last_us)

    def close(self) -> None:
        pass


def track_positions_tws(
    events: DataFrame, state_ttl_ms: int | None = None
) -> DataFrame:
    """:func:`track_positions` on Spark 4's ``transformWithStateInPandas``.

    Same semantics as the ``applyInPandasWithState`` path (one shuffle
    onto contract_id, O(1) state per key, update-mode emissions), on the
    successor operator API. What the new API buys at scale:

    - **State TTL is declarative**: ``getValueState(..., ttlDurationMs=…)``
      expires idle keys with no timeout-branch code — but TTL cannot
      see the value, so it evicts idle OPEN contracts too. Use it only
      where state is re-derivable (caches, sketches); for lifecycle
      state prefer ``track_positions``'s closed-only timeout eviction
      and leave ``state_ttl_ms`` unset here.
    - **Typed composite state** (value/list/map) lives in the RocksDB
      state store (required by this operator), which is also the
      production-scale choice: state >> executor heap spills to disk.
    - Schema evolution of the state store across query restarts is
      supported, which matters for a long-lived 100 TB pipeline.

    Runtime requirements (both satisfied on a real cluster, the second
    NOT in this test container):

    - ``spark.sql.streaming.stateStore.providerClass`` =
      ``...RocksDBStateStoreProvider`` (set on the session before the
      query starts; the operator rejects the default HDFS-backed store);
    - the ``protobuf`` pip package — the Python worker speaks to the
      JVM state server over protobuf (``pyspark/sql/streaming/proto``).
      Where it's absent the query fails at preInit with "Python worker
      failed to connect back"; the live-stream test skips itself, and
      the fold logic is covered by a fake-state unit test instead.
    """
    time_mode = "processingTime" if state_ttl_ms else "none"
    return events.groupBy("contract_id").transformWithStateInPandas(
        PositionsProcessor(state_ttl_ms), POSITION_STATE, "update", time_mode
    )


def positions_batch(events: DataFrame) -> DataFrame:
    """Batch twin of :func:`track_positions` — one shuffle, no Python.

    Used by the gold layer for backfill and by tests as the equivalence
    oracle for the streaming path.
    """
    signed = F.when(F.col("kind") == "open", F.col("amount")).when(
        F.col("kind") == "repay", -F.col("amount")
    )
    agg = events.groupBy("contract_id").agg(
        F.min(F.when(F.col("kind") == "open", F.col("timestamp"))).alias("opened_at"),
        F.coalesce(F.sum(signed), F.lit(0).cast("decimal(38,0)")).alias("principal"),
        F.count(F.when(F.col("kind") == "repay", 1)).alias("n_repayments"),
        F.max(
            F.when(F.col("kind").isin("close", "liquidation"), True).otherwise(False)
        ).alias("closed_explicitly"),
        F.max("timestamp").alias("last_event_at"),
    )
    return agg.select(
        "contract_id",
        "opened_at",
        F.col("principal").cast("decimal(38,0)").alias("principal"),
        F.col("n_repayments").cast("int").alias("n_repayments"),
        F.when(F.col("opened_at").isNull(), "pending")
        .when(F.col("closed_explicitly") | (F.col("principal") <= 0), "closed")
        .otherwise("open")
        .alias("status"),
        "last_event_at",
    )
