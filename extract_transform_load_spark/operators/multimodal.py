"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
typed metadata struct — the schema, partitioning, and Arrow-batched UDF
shape are real and tested; the actual codec work (image decode, resample,
frame extraction) is stubbed because the media libraries are not in this
container. Each stub either raises ``NotImplementedError`` (strict mode)
or produces a deterministic fake derived from the bytes (test mode), so
the distributed plumbing is exercisable end-to-end.

Design rules for 100 TB media tables:
- media bytes live in their own column; metadata queries must never
  touch them (parquet column pruning does this for free — verify with
  ``ReadSchema`` in the plan).
- decode/feature steps run in ``mapInPandas`` (Arrow batches, one Python
  worker per core, no shuffle); batch size is bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` to keep worker RSS flat.
- derived features (embeddings, thumbnails) are written as separate
  tables keyed by content hash, not appended to the media table —
  re-derivation must not rewrite payload bytes.
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # 'image' | 'audio' | 'video'
        StructField("payload", BinaryType(), False),
        StructField("mime", StringType()),
        StructField("source_uri", StringType()),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, content_sha256 string, "
    "crc32 long, width int, height int, duration_ms long"
)


def attach_byte_metadata(media: DataFrame) -> DataFrame:
    """Cheap JVM-side byte accounting (no Python, no decode)."""
    return media.withColumn("n_bytes", F.octet_length("payload").cast("long")).withColumn(
        "content_key", F.sha2(F.col("payload"), 256)
    )


def _fake_dimensions(digest: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for decoded media properties (test mode)."""
    w = 64 + digest[0] % 192
    h = 64 + digest[1] % 192
    dur = int.from_bytes(digest[2:4], "big")
    return w, h, dur


def extract_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    STUB: real decode (PIL/ffmpeg/torchaudio) is unavailable here. In
    ``strict`` mode the UDF raises ``NotImplementedError`` exactly where
    the codec call belongs; otherwise it emits deterministic fakes so the
    batch shape, schema, and partitioning can be tested at scale.
    """

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                data = bytes(payload)
                if strict:
                    raise NotImplementedError(
                        "media decode requires PIL/ffmpeg — not present in this environment"
                    )
                digest = hashlib.sha256(data).digest()
                w, h, dur = _fake_dimensions(digest)
                rows.append(
                    {
                        "media_id": mid,
                        "kind": kind,
                        "n_bytes": len(data),
                        "content_sha256": digest.hex(),
                        "crc32": zlib.crc32(data),
                        "width": w if kind == "image" else None,
                        "height": h if kind == "image" else None,
                        "duration_ms": dur if kind in ("audio", "video") else None,
                    }
                )
            yield pd.DataFrame(rows)

    return media.select("media_id", "kind", "payload").mapInPandas(compute, FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000, strict: bool = False) -> DataFrame:
    """Frame sampling plumbing: one output row per sampled frame.

    STUB decode; emits deterministic frame keys. The exploded shape
    (media_id, frame_idx, frame_ts_ms, frame_key) is the real contract a
    downstream embedding stage consumes.
    """

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                if kind != "video":
                    continue
                data = bytes(payload)
                if strict:
                    raise NotImplementedError("video decode requires ffmpeg")
                digest = hashlib.sha256(data).digest()
                _, _, dur = _fake_dimensions(digest)
                for i, ts in enumerate(range(0, max(dur, 1), every_ms)):
                    frame_key = hashlib.sha256(digest + i.to_bytes(4, "big")).hexdigest()[:16]
                    rows.append(
                        {"media_id": mid, "frame_idx": i, "frame_ts_ms": ts, "frame_key": frame_key}
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_ts_ms", "frame_key"])

    return media.select("media_id", "kind", "payload").mapInPandas(
        compute, "media_id long, frame_idx int, frame_ts_ms long, frame_key string"
    )


def resize_images(
    media: DataFrame, target_w: int = 224, target_h: int = 224, strict: bool = False
) -> DataFrame:
    """Thumbnail/resize plumbing: (media_id, width, height, thumb) rows.

    STUB decode/resample (PIL absent): the fake thumbnail is the
    sha256 stream of the payload truncated to ``target_w*target_h//64``
    bytes — deterministic, size-proportional, so partition sizing and
    Arrow batch shape behave like a real thumbnail column. Non-image
    rows pass through untouched-by-Python via the early filter (column
    pruning keeps their payloads unread).
    """

    n_bytes = max(1, target_w * target_h // 64)

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if strict:
                    raise NotImplementedError("image resize requires PIL/pillow")
                data = bytes(payload)
                stream = b""
                seed = hashlib.sha256(data).digest()
                while len(stream) < n_bytes:
                    stream += seed
                    seed = hashlib.sha256(seed).digest()
                rows.append(
                    {
                        "media_id": mid,
                        "width": target_w,
                        "height": target_h,
                        "thumb": stream[:n_bytes],
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "width", "height", "thumb"])

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(compute, "media_id long, width int, height int, thumb binary")
    )


def accelerator_batches(
    media: DataFrame,
    max_rows: int = 32,
    max_bytes: int = 1 << 20,
    partitions: int | None = None,
) -> DataFrame:
    """Pack payloads into GPU-transfer-shaped batches: one output row per
    batch, carrying a contiguous buffer + an offset manifest.

    Batched GPU decoders (nvJPEG/DALI-style) want N payloads in one
    pinned host buffer per kernel launch, capped by transfer-buffer
    bytes — not a row-at-a-time iterator. This stage builds exactly that
    shape engine-side: greedy packing, closing a batch at ``max_rows``
    OR ``max_bytes`` (an oversized payload gets its own batch). The
    decode kernel itself is the stub downstream; the packing, caps, and
    manifest are the real contract.

    Scale/determinism: packing is partition-local (no shuffle beyond the
    optional repartition) and runs greedily over rows sorted by
    ``media_id`` within each hash partition, so batch composition is a
    pure function of (corpus, partitions, caps) — re-runs rebuild
    byte-identical batches, which makes downstream derived tables
    (embeddings keyed by batch) reproducible.
    """

    src = media.select("media_id", "payload")
    if partitions is not None:
        src = src.repartition(partitions, "media_id")
    src = src.sortWithinPartitions("media_id")

    out_schema = (
        "batch_key long, n_rows int, n_bytes long, "
        "media_ids array<long>, offsets array<long>, packed binary"
    )

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids: list[int] = []
        offs: list[int] = []
        buf = bytearray()

        def flush():
            row = {
                "batch_key": ids[0],
                "n_rows": len(ids),
                "n_bytes": len(buf),
                "media_ids": list(ids),
                "offsets": list(offs),
                "packed": bytes(buf),
            }
            ids.clear()
            offs.clear()
            buf.clear()
            return pd.DataFrame([row])

        for pdf in batches:
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload)
                if ids and (
                    len(ids) >= max_rows or len(buf) + len(data) > max_bytes
                ):
                    yield flush()
                ids.append(int(mid))
                offs.append(len(buf))
                buf.extend(data)
        if ids:
            yield flush()

    return src.mapInPandas(pack, out_schema)
