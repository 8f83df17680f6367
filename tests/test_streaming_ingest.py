"""Streaming ingest idempotency: dropDuplicatesWithinWatermark keeps
exactly one row per PK across microbatches while state stays bounded by
the watermark horizon (plain streaming dropDuplicates on a PK subset
that excludes the event-time column never evicts state — the defect
this operator exists to avoid)."""

from __future__ import annotations

from datetime import datetime, timedelta

from extract_transform_load_spark.streaming.ingest import deduped_stream

SCHEMA = "event_id long, ts timestamp, payload string"
T0 = datetime(2026, 1, 1, 12, 0, 0)


def test_deduped_stream_drops_replays_within_watermark(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(
        [(1, T0, "a"), (2, T0, "b")], SCHEMA
    ).write.parquet(str(src / "batch1.parquet"))

    stream = spark.readStream.schema(SCHEMA).parquet(str(src) + "/*")
    dd = deduped_stream(stream, ["event_id"], event_time_col="ts", watermark="10 minutes")
    q = (
        dd.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        # replay PK 1 (within the horizon) alongside a genuinely new PK
        spark.createDataFrame(
            [
                (1, T0 + timedelta(seconds=30), "a-replay"),
                (3, T0 + timedelta(minutes=1), "c"),
            ],
            SCHEMA,
        ).write.parquet(str(src / "batch2.parquet"))
        q.processAllAvailable()
        rows = spark.table("dedup_stream").collect()
    finally:
        q.stop()

    assert sorted(r["event_id"] for r in rows) == [1, 2, 3]
    assert {r["payload"] for r in rows if r["event_id"] == 1} == {"a"}  # first wins
