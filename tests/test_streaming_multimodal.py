"""End-to-end tests for the streaming ingest wiring (file source →
watermark dedup → foreachBatch → idempotent silver parquet) and the
multimodal binary plumbing."""

from __future__ import annotations

import time

import pyspark.sql.functions as F
import pytest

from extract_transform_load_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    attach_byte_metadata,
    extract_features,
    sample_frames,
)
from extract_transform_load_spark.pipeline.parsers import parse_tr_profit
from extract_transform_load_spark.schemas import BRONZE_EVENT
from extract_transform_load_spark.streaming.ingest import start_silver_stream


def _bronze_rows(start_block: int, n: int):
    from datetime import datetime, timedelta

    base = datetime(2024, 1, 1)
    return [
        (
            start_block + i,
            f"hash{start_block + i}",
            0,
            "wasm-tr-profit",
            base + timedelta(minutes=i),
            {
                "height": str(start_block + i),
                "at": (base + timedelta(minutes=i)).isoformat(),
                "profit-amount-symbol": "USDC",
                "profit-amount-amount": str(100 + i),
            },
        )
        for i in range(n)
    ]


def test_streaming_silver_with_duplicates(spark, tmp_path):
    src = tmp_path / "landing"
    out = tmp_path / "silver"
    ckpt = tmp_path / "ckpt"
    src.mkdir()

    # batch 1 + batch 2 share overlapping blocks -> dedup must drop replays
    spark.createDataFrame(_bronze_rows(100, 5), BRONZE_EVENT).write.parquet(
        str(src / "b1.parquet")
    )
    spark.createDataFrame(_bronze_rows(103, 5), BRONZE_EVENT).write.parquet(
        str(src / "b2.parquet")
    )

    stream = spark.readStream.schema(BRONZE_EVENT).parquet(str(src) + "/*")

    def write_batch(df, batch_id):
        df.write.mode("append").parquet(str(out))

    q = start_silver_stream(
        stream,
        transform=parse_tr_profit,
        write_batch=write_batch,
        checkpoint_dir=str(ckpt),
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            q.processAllAvailable()
            break
    finally:
        q.stop()

    silver = spark.read.parquet(str(out))
    heights = sorted(r["TR_Profit_height"] for r in silver.collect())
    assert heights == list(range(100, 108)), heights  # 8 unique blocks, replays dropped


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", b"\x89PNG fake image bytes 1", "image/png", "s3://x/1"),
        (2, "image", b"\x89PNG fake image bytes 2", "image/png", "s3://x/2"),
        (3, "video", b"\x00\x00ftyp fake mp4 bytes", "video/mp4", "s3://x/3"),
        (4, "audio", b"RIFF fake wav bytes", "audio/wav", "s3://x/4"),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_byte_metadata_jvm_side(media):
    out = attach_byte_metadata(media).select("media_id", "n_bytes", "content_key").collect()
    got = {r["media_id"]: r["n_bytes"] for r in out}
    assert got[1] == len(b"\x89PNG fake image bytes 1")
    assert all(len(r["content_key"]) == 64 for r in out)


def test_extract_features_deterministic(media):
    a = {r["media_id"]: r.asDict() for r in extract_features(media).collect()}
    b = {r["media_id"]: r.asDict() for r in extract_features(media).collect()}
    assert a == b  # deterministic fake decode
    assert a[1]["width"] is not None and a[1]["duration_ms"] is None
    assert a[3]["width"] is None and a[3]["duration_ms"] is not None
    assert a[4]["crc32"] >= 0


def test_extract_features_strict_rejects_malformed(media):
    # the fixture payloads carry magic-number prefixes but no real
    # container structure — strict mode must refuse them, not fake them
    with pytest.raises(Exception) as exc:
        extract_features(media, strict=True).collect()
    assert "ValueError" in str(exc.value) or "not a PNG" in str(exc.value)


def _minimal_png(w: int, h: int) -> bytes:
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    chunk = b"IHDR" + ihdr
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + chunk
        + struct.pack(">I", zlib.crc32(chunk))
    )


def _minimal_wav(byte_rate: int, data_size: int) -> bytes:
    import struct

    fmt = struct.pack("<HHIIHH", 1, 1, byte_rate, byte_rate, 1, 8)
    body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
    body += b"data" + struct.pack("<I", data_size) + b"\x00" * data_size
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _minimal_mp4(timescale: int, duration: int) -> bytes:
    import struct

    ftyp = struct.pack(">I", 16) + b"ftypisom" + struct.pack(">I", 0)
    mvhd_body = b"\x00\x00\x00\x00" + struct.pack(">II", 0, 0)
    mvhd_body += struct.pack(">II", timescale, duration) + b"\x00" * 80
    mvhd = struct.pack(">I", 8 + len(mvhd_body)) + b"mvhd" + mvhd_body
    moov = struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
    return ftyp + moov


def test_extract_features_strict_decodes_real_headers(spark):
    rows = [
        (1, "image", _minimal_png(320, 240), "image/png", "s3://x/a"),
        (2, "audio", _minimal_wav(byte_rate=8000, data_size=16000), "audio/wav", "s3://x/b"),
        (3, "video", _minimal_mp4(timescale=1000, duration=2500), "video/mp4", "s3://x/c"),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r.asDict() for r in extract_features(df, strict=True).collect()}
    assert (got[1]["width"], got[1]["height"]) == (320, 240)
    assert got[2]["duration_ms"] == 2000  # 16000 bytes / 8000 B/s
    assert got[3]["duration_ms"] == 2500  # 2500 ticks @ 1000 ticks/s


def test_sample_frames_strict_uses_real_mp4_timeline(spark):
    rows = [(7, "video", _minimal_mp4(timescale=600, duration=1800), "video/mp4", "s3://x/v")]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    frames = sample_frames(df, every_ms=1000, strict=True).collect()
    # 3000 ms timeline sampled at 1 s -> frames at 0, 1000, 2000
    assert sorted(r["frame_ts_ms"] for r in frames) == [0, 1000, 2000]


def test_resize_strict_validates_then_requires_pil(spark):
    from extract_transform_load_spark.operators.multimodal import resize_images

    ok = spark.createDataFrame(
        [(1, "image", _minimal_png(8, 8), "image/png", "s3://x/p")], MEDIA_SCHEMA
    )
    try:
        import PIL  # noqa: F401

        out = resize_images(ok, 4, 4, strict=True).collect()
        assert out and out[0]["width"] == 4
    except ImportError:
        # without PIL the header is validated, then the resample raises
        with pytest.raises(Exception) as exc:
            resize_images(ok, 4, 4, strict=True).collect()
        assert "NotImplementedError" in str(exc.value) or "PIL" in str(exc.value)
        bad = spark.createDataFrame(
            [(2, "image", b"garbage", "image/png", "s3://x/g")], MEDIA_SCHEMA
        )
        with pytest.raises(Exception) as exc:
            resize_images(bad, 4, 4, strict=True).collect()
        assert "ValueError" in str(exc.value) or "not a" in str(exc.value)


def test_sample_frames_only_video(media):
    frames = sample_frames(media, every_ms=5000).collect()
    assert len(frames) > 0
    assert {r["media_id"] for r in frames} == {3}
    idxs = sorted(r["frame_idx"] for r in frames)
    assert idxs == list(range(len(idxs)))


def test_streaming_windowed_counts_match_batch(spark, tmp_path):
    """Tumbling-window streaming agg == the equivalent batch GROUP BY."""
    from extract_transform_load_spark.streaming.ingest import windowed_counts

    src = tmp_path / "ev"
    src.mkdir()
    rows = _bronze_rows(500, 50)  # 50 events, 1/minute from 2024-01-01 00:00
    spark.createDataFrame(rows, BRONZE_EVENT).write.parquet(str(src / "a.parquet"))

    stream = spark.readStream.schema(BRONZE_EVENT).parquet(str(src) + "/*")
    q = (
        windowed_counts(stream, "timestamp", "15 minutes", "1 hour", ["event_type"])
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (str(r["window_start"]), r["n"])
        for r in spark.sql("select * from win_counts").collect()
    }
    batch = spark.createDataFrame(rows, BRONZE_EVENT)
    want = {
        (str(r["w"]["start"]), r["n"])
        for r in batch.groupBy(
            F.window("timestamp", "15 minutes").alias("w"), "event_type"
        ).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # complete mode emits every window state — must equal the batch twin
    # (append mode would hold back open windows until the watermark
    # passes, which needs a follow-up microbatch to observe)
    assert got == want


def test_resize_images_shape_and_determinism(media):
    from extract_transform_load_spark.operators.multimodal import resize_images

    a = {r["media_id"]: r.asDict() for r in resize_images(media, 64, 64).collect()}
    b = {r["media_id"]: r.asDict() for r in resize_images(media, 64, 64).collect()}
    assert set(a) == {1, 2}  # images only
    assert all(len(r["thumb"]) == 64 * 64 // 64 for r in a.values())
    assert {k: bytes(v["thumb"]) for k, v in a.items()} == {
        k: bytes(v["thumb"]) for k, v in b.items()
    }
    assert bytes(a[1]["thumb"]) != bytes(a[2]["thumb"])


def test_streaming_merge_sink_upserts_across_microbatches(spark, tmp_path):
    """foreachBatch + merge_parquet: microbatch 2 updates a PK written by
    microbatch 1 (and inserts a new one); the target parquet holds the
    upserted state — the streaming twin of the reference's per-block
    ON CONFLICT transaction."""
    from extract_transform_load_spark.streaming.ingest import merge_sink

    src = tmp_path / "src"
    src.mkdir()
    schema = "id long, day int, v string, ver int"
    b1 = [(1, 1, "one", 1), (2, 1, "two", 1), (3, 2, "three", 1)]
    b2 = [(2, 1, "two-updated", 2), (4, 2, "four", 2)]
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(str(src / "b1.parquet"))
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(str(src / "b2.parquet"))

    target = str(tmp_path / "target")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    q = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .foreachBatch(merge_sink(target, ["id"], partition_col="day", order_col="ver"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    out = {r["id"]: (r["day"], r["v"], r["ver"]) for r in spark.read.parquet(target).collect()}
    assert out == {
        1: (1, "one", 1),
        2: (1, "two-updated", 2),
        3: (2, "three", 1),
        4: (2, "four", 2),
    }


def test_accelerator_batches_pack_exactly_and_respect_caps(spark):
    from extract_transform_load_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        accelerator_batches,
    )

    payloads = {i: bytes([i % 251]) * (50 + 37 * i % 400) for i in range(1, 41)}
    rows = [(i, "image", p, "image/png", f"s3://x/{i}") for i, p in payloads.items()]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)

    batches = accelerator_batches(df, max_rows=8, max_bytes=1200, partitions=4).collect()

    seen = {}
    for b in batches:
        assert b["n_rows"] <= 8
        assert b["n_rows"] == len(b["media_ids"]) == len(b["offsets"])
        assert b["n_bytes"] == len(b["packed"])
        # oversized-single-payload is the only way past the byte cap
        assert b["n_bytes"] <= 1200 or b["n_rows"] == 1
        ends = list(b["offsets"][1:]) + [b["n_bytes"]]
        for mid, off, end in zip(b["media_ids"], b["offsets"], ends):
            seen[mid] = bytes(b["packed"][off:end])
    # every payload packed exactly once, byte-identical
    assert seen == payloads


def test_accelerator_batches_deterministic_across_runs(spark):
    from extract_transform_load_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        accelerator_batches,
    )

    rows = [
        (i, "image", bytes([i]) * (20 + i), "image/png", f"s3://x/{i}")
        for i in range(1, 30)
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)

    def snapshot():
        return sorted(
            (b["batch_key"], tuple(b["media_ids"]), bytes(b["packed"]))
            for b in accelerator_batches(df, max_rows=5, max_bytes=500, partitions=3).collect()
        )

    assert snapshot() == snapshot()
