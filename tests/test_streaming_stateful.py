"""Stream/batch equivalence for the applyInPandasWithState position
tracker: state must carry across microbatches and the final emitted
state per contract must equal the batch twin."""

from __future__ import annotations

from datetime import datetime, timedelta
from decimal import Decimal

from extract_transform_load_spark.streaming.stateful import (
    POSITION_EVENT,
    positions_batch,
    track_positions,
)

BASE = datetime(2024, 1, 1)


def _events():
    d = Decimal
    rows = [
        # c0: fully repaid -> closed via zero principal
        ("c0", "open", d(1000), BASE),
        ("c0", "repay", d(400), BASE + timedelta(hours=1)),
        ("c0", "repay", d(600), BASE + timedelta(hours=30)),
        # c1: partially repaid -> open
        ("c1", "open", d(1000), BASE),
        ("c1", "repay", d(300), BASE + timedelta(hours=31)),
        # c2: market-closed with principal left
        ("c2", "open", d(500), BASE + timedelta(hours=2)),
        ("c2", "close", d(0), BASE + timedelta(hours=32)),
        # c3: opened only
        ("c3", "open", d(750), BASE + timedelta(hours=33)),
    ]
    early = [r for r in rows if r[3] < BASE + timedelta(hours=24)]
    late = [r for r in rows if r[3] >= BASE + timedelta(hours=24)]
    return rows, early, late


def test_stateful_stream_matches_batch(spark, tmp_path):
    rows, early, late = _events()
    src = tmp_path / "ev"
    src.mkdir()
    # two files + maxFilesPerTrigger=1 -> state must survive the
    # microbatch boundary (c0/c1 open in batch 1, mutate in batch 2)
    spark.createDataFrame(early, POSITION_EVENT).coalesce(1).write.parquet(
        str(src / "b1.parquet")
    )
    spark.createDataFrame(late, POSITION_EVENT).coalesce(1).write.parquet(
        str(src / "b2.parquet")
    )

    stream = (
        spark.readStream.schema(POSITION_EVENT)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    q = (
        track_positions(stream)
        .writeStream.format("memory")
        .queryName("positions")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    emitted = spark.sql("select * from positions").collect()
    # update mode: one row per (contract, microbatch-with-events);
    # the latest emission per contract is its final state
    latest = {}
    for r in emitted:
        cur = latest.get(r["contract_id"])
        if cur is None or r["last_event_at"] > cur["last_event_at"]:
            latest[r["contract_id"]] = r
    got = {
        c: (r["opened_at"], r["principal"], r["n_repayments"], r["status"], r["last_event_at"])
        for c, r in latest.items()
    }

    batch = positions_batch(spark.createDataFrame(rows, POSITION_EVENT)).collect()
    want = {
        r["contract_id"]: (
            r["opened_at"], r["principal"], r["n_repayments"], r["status"], r["last_event_at"]
        )
        for r in batch
    }
    assert got == want
    assert want["c0"][3] == "closed" and want["c0"][1] == Decimal(0)
    assert want["c1"][3] == "open" and want["c1"][1] == Decimal(700)
    assert want["c2"][3] == "closed"
    assert want["c3"][3] == "open"
    # c0 and c1 were updated across both microbatches -> >=2 emissions each
    assert sum(1 for r in emitted if r["contract_id"] == "c0") >= 2


def test_idle_timeout_evicts_closed(spark, tmp_path):
    """With a processing-time timeout, idle CLOSED contracts get one
    final emission and are evicted; idle OPEN contracts keep their
    state and emit nothing further (eviction would zero a live
    position). A re-open after eviction restarts from scratch —
    documented."""
    rows, early, late = _events()
    src = tmp_path / "ev"
    src.mkdir()
    spark.createDataFrame(early + late, POSITION_EVENT).coalesce(1).write.parquet(
        str(src / "b1.parquet")
    )
    stream = (
        spark.readStream.schema(POSITION_EVENT)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    q = (
        track_positions(stream, idle_timeout_ms=50)
        .writeStream.format("memory")
        .queryName("positions_t")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .start()
    )
    # NOTE: with ProcessingTimeTimeout the engine keeps scheduling
    # (empty) batches to fire expired timers, so processAllAvailable()
    # never settles — poll the sink with a deadline instead.
    import time

    per_key = {}
    try:
        deadline = time.time() + 90
        while time.time() < deadline:
            emitted = spark.sql("select * from positions_t").collect()
            per_key = {c: 0 for c in ("c0", "c1", "c2", "c3")}
            for r in emitted:
                if r["contract_id"] in per_key:
                    per_key[r["contract_id"]] += 1
            # closed contracts (c0 repaid to zero, c2 market-closed):
            # one update emission + one timeout (final) emission
            if per_key["c0"] >= 2 and per_key["c2"] >= 2:
                break
            time.sleep(1)
    finally:
        q.stop()
    assert per_key["c0"] >= 2 and per_key["c2"] >= 2, per_key
    # open contracts keep their state: update emission only, no
    # timeout emission however many timers fired meanwhile
    assert per_key["c1"] == 1 and per_key["c3"] == 1, per_key


def test_tws_processor_matches_batch(spark):
    """transformWithStateInPandas fold logic: drive PositionsProcessor
    through a fake state handle across two simulated microbatches; the
    final emission per contract must equal the batch twin. (The live
    streaming run needs the protobuf package — absent here — so this
    unit test is the container-side coverage for the tws path.)"""
    import pandas as pd

    from extract_transform_load_spark.streaming.stateful import PositionsProcessor

    class FakeState:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    class FakeHandle:
        def __init__(self):
            self.state = FakeState()
            self.ttl = "unset"

        def getValueState(self, name, schema, ttlDurationMs=None):
            self.ttl = ttlDurationMs
            return self.state

    rows, early, late = _events()
    proc = PositionsProcessor()
    handle = FakeHandle()
    proc.init(handle)
    assert handle.ttl is None

    cols = ["contract_id", "kind", "amount", "timestamp"]
    final = {}
    for batch in (early, late):  # state must carry across the boundary
        pdf = pd.DataFrame(batch, columns=cols)
        for cid, grp in pdf.groupby("contract_id"):
            # fresh processor instance per key mimics worker isolation,
            # but the *state* persists in the store (FakeState per key)
            key_state = final.setdefault(cid, FakeState())
            proc._state = key_state
            (out,) = list(proc.handleInputRows((cid,), iter([grp]), None))
            final[cid] = key_state
            final[f"row:{cid}"] = out.iloc[0]

    got = {
        c: (
            r["opened_at"].to_pydatetime(),
            r["principal"],
            int(r["n_repayments"]),
            r["status"],
            r["last_event_at"].to_pydatetime(),
        )
        for c, r in ((c[4:], final[c]) for c in final if str(c).startswith("row:"))
    }
    batch = positions_batch(spark.createDataFrame(rows, POSITION_EVENT)).collect()
    want = {
        r["contract_id"]: (
            r["opened_at"], r["principal"], r["n_repayments"], r["status"], r["last_event_at"]
        )
        for r in batch
    }
    assert got == want


def test_tws_stream_matches_batch(spark, tmp_path):
    """transformWithStateInPandas path: same cross-microbatch semantics
    as the applyInPandasWithState tracker, on the Spark 4 successor API
    (requires the RocksDB state store provider + the protobuf package
    for the Python<->JVM state protocol)."""
    import pytest

    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState Python worker needs protobuf (not in container)",
    )
    from extract_transform_load_spark.streaming.stateful import track_positions_tws

    rows, early, late = _events()
    src = tmp_path / "ev"
    src.mkdir()
    spark.createDataFrame(early, POSITION_EVENT).coalesce(1).write.parquet(
        str(src / "b1.parquet")
    )
    spark.createDataFrame(late, POSITION_EVENT).coalesce(1).write.parquet(
        str(src / "b2.parquet")
    )

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = (
            spark.readStream.schema(POSITION_EVENT)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src) + "/*")
        )
        q = (
            track_positions_tws(stream)
            .writeStream.format("memory")
            .queryName("positions_tws")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)

    emitted = spark.sql("select * from positions_tws").collect()
    latest = {}
    for r in emitted:
        cur = latest.get(r["contract_id"])
        if cur is None or r["last_event_at"] > cur["last_event_at"]:
            latest[r["contract_id"]] = r
    got = {
        c: (r["opened_at"], r["principal"], r["n_repayments"], r["status"], r["last_event_at"])
        for c, r in latest.items()
    }
    batch = positions_batch(spark.createDataFrame(rows, POSITION_EVENT)).collect()
    want = {
        r["contract_id"]: (
            r["opened_at"], r["principal"], r["n_repayments"], r["status"], r["last_event_at"]
        )
        for r in batch
    }
    assert got == want
    # state survived the microbatch boundary: c0/c1 emitted in both batches
    assert sum(1 for r in emitted if r["contract_id"] == "c0") >= 2


def test_streaming_session_window_matches_batch(spark, tmp_path):
    """Streaming session_window (append mode — the only supported output
    for session windows): a bridging event in a later microbatch merges
    two open sessions, and the finalized emission equals the batch twin
    restricted to watermark-closed sessions."""
    import pyspark.sql.functions as F

    from extract_transform_load_spark.schemas import BRONZE_EVENT
    from extract_transform_load_spark.streaming.ingest import session_counts

    from .test_streaming_multimodal import _bronze_rows

    base = datetime(2024, 1, 1)
    src = tmp_path / "ev"
    src.mkdir()
    # b1: two bursts 10 min apart (gap 5 min -> two open sessions)
    burst1 = _bronze_rows(100, 3)  # 00:00..00:02
    burst2 = [
        (200 + i, f"hash2{i}", 0, "wasm-tr-profit", base + timedelta(minutes=12 + i), {"k": "v"})
        for i in range(3)
    ]
    # b2: bridge events inside the 00:02..00:12 hole -> one merged session
    bridge = [
        (300, "hashbr", 0, "wasm-tr-profit", base + timedelta(minutes=6), {"k": "v"}),
        (301, "hashbr2", 0, "wasm-tr-profit", base + timedelta(minutes=9), {"k": "v"}),
    ]
    # b3: far-future flush pushes the watermark past the merged session
    flush = [(400, "hashfl", 0, "wasm-tr-profit", base + timedelta(hours=2), {"k": "v"})]
    for i, rows in enumerate([burst1 + burst2, bridge, flush]):
        spark.createDataFrame(rows, BRONZE_EVENT).coalesce(1).write.parquet(
            str(src / f"b{i}.parquet")
        )

    stream = (
        spark.readStream.schema(BRONZE_EVENT)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    q = (
        session_counts(stream, "timestamp", gap="5 minutes", watermark="30 minutes", group_cols=["event_type"])
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (str(r["session_start"]), str(r["session_end"]), r["event_type"], r["n"])
        for r in spark.sql("select * from sessions").collect()
    }
    # batch twin over everything, restricted to sessions the final
    # watermark (02:00 - 30 min = 01:30) closed
    batch = spark.createDataFrame(burst1 + burst2 + bridge + flush, BRONZE_EVENT)
    closed = (
        batch.groupBy(F.session_window("timestamp", "5 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "event_type",
            "n",
        )
        .filter(F.col("session_end") <= F.lit(base + timedelta(minutes=90)))
    )
    want = {
        (str(r["session_start"]), str(r["session_end"]), r["event_type"], r["n"])
        for r in closed.collect()
    }
    assert got == want, (got, want)
    # exactly one merged session covering bursts + bridge (8 events)
    assert len(want) == 1 and next(iter(want))[3] == 8
