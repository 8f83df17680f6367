"""Custom blockfeed streaming source (SURVEY.md §2.A A1/A2/A4):
height offsets, bounded-channel pacing, partitioned range replay, and
exactly-once delivery across a checkpoint restart."""

from __future__ import annotations

from datetime import datetime, timedelta

import pyspark.sql.functions as F

from extract_transform_load_spark.schemas import BRONZE_EVENT
from extract_transform_load_spark.sources.blockfeed import _SCHEMA_DDL, subscribe_blocks

T0 = datetime(2026, 1, 1, 12, 0, 0)


def _land(spark, path, lo, hi, fname):
    """Append bronze rows for blocks lo..hi (one event per block)."""
    rows = [
        (b, f"tx{b:04d}", 0, "wasm-ls-open", T0 + timedelta(seconds=b), {"height": str(b)})
        for b in range(lo, hi + 1)
    ]
    spark.createDataFrame(rows, BRONZE_EVENT).write.parquet(f"{path}/{fname}")


def test_ddl_matches_bronze_schema(spark):
    ddl = spark.createDataFrame([], _SCHEMA_DDL).schema
    assert [(f.name, f.dataType) for f in ddl.fields] == [
        (f.name, f.dataType) for f in BRONZE_EVENT.fields
    ]


def _run_to_memory(spark, landing, name, ck, blocks_per_batch=10):
    stream = subscribe_blocks(
        spark, str(landing), blocks_per_batch=blocks_per_batch, num_partitions=3
    )
    return (
        stream.withColumn("batch", F.spark_partition_id() * 0)  # keep schema simple
        .drop("batch")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(ck))
        .start()
    )


def test_delivery_pacing_and_partitioned_ranges(spark, tmp_path):
    """All landed blocks arrive exactly once; after the catch-up batch,
    no microbatch spans more than blocks_per_batch heights."""
    landing = tmp_path / "landing"
    landing.mkdir()
    _land(spark, landing, 1, 7, "b1.parquet")

    q = _run_to_memory(spark, landing, "feed1", tmp_path / "ck1", blocks_per_batch=10)
    try:
        q.processAllAvailable()
        got = {r["block"] for r in spark.sql("select block from feed1").collect()}
        assert got == set(range(1, 8))

        # producer lands 30 more blocks; pacing caps each trigger at 10
        _land(spark, landing, 8, 37, "b2.parquet")
        q.processAllAvailable()
        rows = spark.sql("select block, tx_hash from feed1").collect()
        assert {r["block"] for r in rows} == set(range(1, 38))
        assert len(rows) == 37  # exactly once
        progress = [p for p in q.recentProgress if p["numInputRows"] > 0]
        # catch-up batch (7 blocks) + paced batches of <= 10
        assert all(p["numInputRows"] <= 10 for p in progress), [
            p["numInputRows"] for p in progress
        ]
        assert len(progress) >= 4  # 7, then 30 blocks at <= 10 per trigger
    finally:
        q.stop()


def test_exactly_once_across_restart(spark, tmp_path):
    """Stop the query, land more blocks, restart on the same checkpoint:
    no duplicates, no gaps — the reference's per-block transactional
    insert + block ledger (A5), done by offset checkpointing."""
    landing = tmp_path / "landing"
    landing.mkdir()
    ck = tmp_path / "ck"
    out = tmp_path / "silver"
    _land(spark, landing, 1, 12, "b1.parquet")

    def start():
        stream = subscribe_blocks(spark, str(landing), blocks_per_batch=5, num_partitions=3)
        return (
            stream.writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ck))
            .outputMode("append")
            .start()
        )

    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    first = sorted(r["block"] for r in spark.read.parquet(str(out)).collect())
    assert first == list(range(1, 13))

    _land(spark, landing, 13, 20, "b2.parquet")
    q2 = start()
    try:
        q2.processAllAvailable()
        final = sorted(r["block"] for r in spark.read.parquet(str(out)).collect())
        # across the restart: nothing replayed, nothing lost
        assert final == list(range(1, 21))
    finally:
        q2.stop()


def test_live_path_capstone_blockfeed_to_silver(spark, tmp_path):
    """The reference's full live loop on the real source: blockfeed →
    watermarked PK dedup → the BATCH parser inside foreachBatch →
    MERGE-upsert silver parquet — then stop, land more blocks, restart
    on the same checkpoint and verify the silver table is exactly the
    batch-parse of everything landed (incremental == full recompute)."""
    from extract_transform_load_spark.pipeline.parsers import parse_ls_opening
    from extract_transform_load_spark.streaming.ingest import merge_sink, start_silver_stream

    landing = tmp_path / "landing"
    landing.mkdir()
    silver = str(tmp_path / "silver_ls_opening")
    ck = str(tmp_path / "ck")

    def land(lo, hi, fname):
        rows = [
            (
                b,
                f"tx{b:04d}",
                0,
                "wasm-ls-open",
                T0 + timedelta(seconds=b),
                {
                    "height": str(b),
                    "id": f"lease{b}",
                    "customer": f"addr{b % 7}",
                    "currency": "ATOM",
                    "air": "105",
                    "loan-pool-id": "pool1",
                    "loan-amount": str(1000 + b),
                    "loan-symbol": "USDC",
                    "downpayment-amount": "250",
                    "downpayment-symbol": "USDC",
                },
            )
            for b in range(lo, hi + 1)
        ]
        spark.createDataFrame(rows, BRONZE_EVENT).write.parquet(f"{landing}/{fname}")

    def run_stream():
        q = start_silver_stream(
            subscribe_blocks(spark, str(landing), blocks_per_batch=8),
            parse_ls_opening,
            merge_sink(silver, pk=["LS_contract_id"], order_col="Block"),
            checkpoint_dir=ck,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    land(1, 20, "b1.parquet")
    run_stream()
    land(21, 33, "b2.parquet")
    run_stream()  # restart on the same checkpoint

    got = spark.read.parquet(silver)
    want = parse_ls_opening(spark.read.parquet(f"{landing}/*.parquet"))
    assert got.count() == 33
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_gap_scan_plus_batch_backfill_reconciles_late_blocks(spark, tmp_path):
    """The A4 division of labor, end-to-end with the real source: a
    producer gap (heights 20-25 missing) streams through as-is (offsets
    have passed, a late file is NOT re-delivered by design), the gap
    scan over the delivered block ledger finds exactly that range, and
    the batch backfill path (idempotent anti-join append) reconciles it
    — mirroring the reference's live-vs-backfill split."""
    from extract_transform_load_spark.pipeline.ingest import idempotent_append, missing_ranges

    landing = tmp_path / "landing"
    landing.mkdir()
    _land(spark, landing, 1, 19, "b1.parquet")
    _land(spark, landing, 26, 40, "b2.parquet")  # 20-25 never landed

    out = tmp_path / "silver"
    stream = subscribe_blocks(spark, str(landing), blocks_per_batch=50)
    q = (
        stream.writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    delivered = spark.read.parquet(str(out))
    ledger = delivered.select(F.col("block").alias("id")).distinct()
    gaps = missing_ranges(ledger).collect()
    assert [(g["gap_start"], g["gap_end"]) for g in gaps] == [(20, 25)]

    # the late producer file arrives; batch backfill replays just the gap
    _land(spark, landing, 20, 25, "late.parquet")
    gap_rows = spark.read.parquet(f"{landing}/late.parquet")
    reconciled = idempotent_append(delivered, gap_rows, ["block", "tx_hash", "event_index"])
    blocks = sorted(
        r["block"] for r in delivered.unionByName(reconciled).select("block").collect()
    )
    assert blocks == list(range(1, 41))
    # replaying the same late file again appends nothing (insert-if-absent)
    again = idempotent_append(delivered.unionByName(reconciled), gap_rows,
                              ["block", "tx_hash", "event_index"])
    assert again.count() == 0


def test_blockfeed_feeds_silver_parsers(spark, tmp_path):
    """One code path: the streamed bronze rows parse through the same
    batch parser used by backfill (pipeline.parsers), and the streamed
    silver equals the batch silver over the same landing data."""
    from extract_transform_load_spark.pipeline.parsers import parse_ls_opening

    landing = tmp_path / "landing"
    landing.mkdir()
    rows = [
        (
            b,
            f"tx{b:04d}",
            0,
            "wasm-ls-open",
            T0 + timedelta(seconds=b),
            {
                "height": str(b),
                "id": f"lease{b}",
                "customer": f"addr{b}",
                "currency": "ATOM",
                "air": "105",
                "loan-pool-id": "pool1",
                "loan-amount": "1000",
                "loan-symbol": "USDC",
                "downpayment-amount": "250",
                "downpayment-symbol": "USDC",
            },
        )
        for b in range(1, 6)
    ]
    spark.createDataFrame(rows, BRONZE_EVENT).write.parquet(f"{landing}/b1.parquet")

    stream = subscribe_blocks(spark, str(landing), blocks_per_batch=2)
    q = (
        parse_ls_opening(stream)
        .writeStream.format("memory")
        .queryName("silver_ls_open")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = spark.sql("select * from silver_ls_open")
    batch = parse_ls_opening(spark.read.parquet(f"{landing}/b1.parquet"))
    assert streamed.exceptAll(batch).count() == 0 and batch.exceptAll(streamed).count() == 0
    assert streamed.count() == 5


def test_landing_files_prunes_staging_and_survives_races(tmp_path):
    """The landing walk must never descend into a concurrent writer's
    _temporary staging tree (the round-7 flake: pyarrow discovery listed
    a commit dir the instant the committer renamed it away) and must
    skip dot-/underscore-prefixed names at every level."""
    from extract_transform_load_spark.sources.blockfeed import _landing_files

    (tmp_path / "block_1.parquet").write_bytes(b"x")
    sub = tmp_path / "b2.parquet"
    (sub / "_temporary" / "0" / "task_123").mkdir(parents=True)
    (sub / "_temporary" / "0" / "task_123" / "part-0.parquet").write_bytes(b"x")
    (sub / "part-00000.parquet").write_bytes(b"x")
    (sub / "_SUCCESS").write_bytes(b"")
    (tmp_path / "_spark_metadata").mkdir()
    (tmp_path / "_spark_metadata" / "0.parquet").write_bytes(b"x")
    (tmp_path / ".hidden.parquet").write_bytes(b"x")

    got = [p.replace(str(tmp_path) + "/", "") for p in _landing_files(str(tmp_path))]
    assert got == ["b2.parquet/part-00000.parquet", "block_1.parquet"]


def test_landing_files_rejects_object_store_uris():
    """os.walk over an s3://-style URI silently yields nothing, which
    would stall the stream headless — a URI scheme must fail loudly
    instead (round-8 ADVICE fix)."""
    import pytest

    from extract_transform_load_spark.sources.blockfeed import _landing_files

    for uri in ("s3://bucket/landing", "hdfs://nn:8020/landing", "abfss://c@a/x"):
        with pytest.raises(ValueError, match="local filesystem"):
            _landing_files(uri)
    # a plain absolute path with a colon elsewhere is NOT a scheme
    assert _landing_files("/tmp/does-not-exist-blockfeed") == []


def test_read_retry_is_gated_on_zero_rows_yielded(tmp_path, monkeypatch, spark):
    """Duplicate-free retry contract (round-8 ADVICE fix, refined): a
    FileNotFoundError BEFORE the first yielded row may retry in-process
    (fresh listing; nothing emitted, so nothing can duplicate — the
    observed compaction race fails here, at footer-open time), but a
    MID-STREAM failure must propagate so Spark's task retry re-runs the
    partition with the failed attempt's output discarded — an
    in-generator restart would re-yield already emitted rows into the
    same attempt. The driver-side _head poll keeps its one-retry: its
    output is a scalar."""
    import pyarrow.dataset as ds
    import pytest

    from extract_transform_load_spark.sources import blockfeed as bf

    # one real landing file so the listing is non-empty
    spark.createDataFrame(
        [(1, "h1", 0, "t", None, {})],
        "block bigint, tx_hash string, event_index int, event_type string, "
        "timestamp timestamp, attributes map<string,string>",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "land"))

    calls = {"n": 0}
    real = ds.dataset

    def flaky_at_open(*a, **k):
        calls["n"] += 1
        raise FileNotFoundError("file vanished at footer open")

    monkeypatch.setattr(ds, "dataset", flaky_at_open)
    reader = bf._BlockFeedReader({"path": str(tmp_path / "land")})
    part = bf._Range(str(tmp_path / "land"), 0, 10)
    with pytest.raises(FileNotFoundError):
        list(reader.read(part))
    assert calls["n"] == 2  # pre-yield: ONE in-process retry, then raise

    # pre-yield failure that heals on the retry: full rows, no dupes
    calls["n"] = 0

    def flaky_once(*a, **k):
        calls["n"] += 1
        if calls["n"] == 1:
            raise FileNotFoundError("healed on re-list")
        return real(*a, **k)

    monkeypatch.setattr(ds, "dataset", flaky_once)
    rows = list(reader.read(part))
    assert calls["n"] == 2 and [r[0] for r in rows] == [1]

    # MID-STREAM failure (rows already yielded) must NOT retry in-process
    calls["n"] = 0

    class MidStreamDataset:
        def __init__(self, inner):
            self._inner = inner

        def to_batches(self, **kw):
            yield from self._inner.to_batches(**kw)
            raise FileNotFoundError("vanished mid-stream")

    def wrap(*a, **k):
        calls["n"] += 1
        return MidStreamDataset(real(*a, **k))

    monkeypatch.setattr(ds, "dataset", wrap)
    got = []
    with pytest.raises(FileNotFoundError):
        for row in reader.read(part):
            got.append(row)
    assert calls["n"] == 1  # no second attempt: Spark owns the retry now
    assert [r[0] for r in got] == [1]  # the attempt's partial output

    # _head DOES retry once (fresh listing) before giving up
    calls["n"] = 0
    monkeypatch.setattr(ds, "dataset", flaky_at_open)
    with pytest.raises(FileNotFoundError):
        bf._head(str(tmp_path / "land"))
    assert calls["n"] == 2
    monkeypatch.setattr(ds, "dataset", real)
