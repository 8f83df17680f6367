"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
typed metadata struct — the schema, partitioning, and Arrow-batched UDF
shape are real and tested. ``strict`` mode decodes the actual container:
PIL when installed, else pure-Python PNG/JPEG/WAV/MP4 header parsers
(dimensions, duration, CRC/box validation) with malformed payloads
raising; only pixel-level resampling still requires PIL. Non-strict mode
produces deterministic fakes derived from the bytes so the distributed
plumbing is exercisable with arbitrary payloads.

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


# ---------------------------------------------------------------------------
# Strict-mode container parsers — pure Python, no media libraries.
#
# Strict mode is a REAL decode of the container header: PNG IHDR (with CRC
# check), JPEG SOF marker walk, WAV RIFF fmt/data chunks, MP4 moov/mvhd box
# walk. Pixel/sample payloads stay opaque (that part needs PIL/ffmpeg), but
# dimensions and duration — the columns FEATURE_SCHEMA promises — come from
# the actual bytes, and a payload that is not a well-formed container raises
# instead of silently producing fakes.
# ---------------------------------------------------------------------------


def _png_dimensions(data: bytes) -> tuple[int, int]:
    """Width/height from the IHDR chunk (PNG spec §11.2.2), CRC-verified."""
    if len(data) < 33 or data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG: bad signature")
    length = int.from_bytes(data[8:12], "big")
    if data[12:16] != b"IHDR" or length != 13:
        raise ValueError("not a PNG: first chunk is not a 13-byte IHDR")
    crc = int.from_bytes(data[16 + 13 : 20 + 13], "big")
    if zlib.crc32(data[12 : 16 + 13]) != crc:
        raise ValueError("PNG IHDR CRC mismatch")
    w = int.from_bytes(data[16:20], "big")
    h = int.from_bytes(data[20:24], "big")
    if not w or not h:
        raise ValueError("PNG IHDR has zero dimension")
    return w, h


def _jpeg_dimensions(data: bytes) -> tuple[int, int]:
    """Width/height from the first SOFn marker (ITU T.81 §B.2.2)."""
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    i = 2
    while i + 4 <= len(data):
        if data[i] != 0xFF:
            raise ValueError("JPEG marker stream corrupt")
        marker = data[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:  # no-payload markers
            i += 2
            continue
        seg_len = int.from_bytes(data[i + 2 : i + 4], "big")
        # SOF0..SOF15 except DHT(C4)/JPG(C8)/DAC(CC)
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if i + 9 > len(data):
                break
            h = int.from_bytes(data[i + 5 : i + 7], "big")
            w = int.from_bytes(data[i + 7 : i + 9], "big")
            return w, h
        i += 2 + seg_len
    raise ValueError("JPEG has no SOF marker")


def _image_dimensions(data: bytes) -> tuple[int, int]:
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return _png_dimensions(data)
    if data[:2] == b"\xff\xd8":
        return _jpeg_dimensions(data)
    raise ValueError("unsupported image container (PNG/JPEG headers known)")


def _wav_duration_ms(data: bytes) -> int:
    """Duration from the RIFF fmt byte-rate and data chunk size."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE header")
    i, byte_rate, data_size = 12, None, None
    while i + 8 <= len(data):
        cid = data[i : i + 4]
        size = int.from_bytes(data[i + 4 : i + 8], "little")
        if cid == b"fmt ":
            if size < 16 or i + 8 + 16 > len(data):
                raise ValueError("WAV fmt chunk truncated")
            byte_rate = int.from_bytes(data[i + 16 : i + 20], "little")
        elif cid == b"data":
            data_size = size
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if not byte_rate or data_size is None:
        raise ValueError("WAV missing fmt or data chunk")
    return data_size * 1000 // byte_rate


def _walk_mp4_boxes(data: bytes, start: int, end: int):
    i = start
    while i + 8 <= end:
        size = int.from_bytes(data[i : i + 4], "big")
        box = data[i + 4 : i + 8]
        header = 8
        if size == 1:  # 64-bit largesize
            if i + 16 > end:
                raise ValueError("MP4 largesize box truncated")
            size = int.from_bytes(data[i + 8 : i + 16], "big")
            header = 16
        elif size == 0:  # box extends to EOF
            size = end - i
        if size < header or i + size > end:
            raise ValueError("MP4 box size out of bounds")
        yield box, i + header, i + size
        i += size


def _mp4_duration_ms(data: bytes) -> int:
    """Duration from moov/mvhd (ISO 14496-12 §8.2.2)."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an MP4: first box is not ftyp")
    for box, lo, hi in _walk_mp4_boxes(data, 0, len(data)):
        if box != b"moov":
            continue
        for inner, ilo, _ihi in _walk_mp4_boxes(data, lo, hi):
            if inner != b"mvhd":
                continue
            version = data[ilo]
            if version == 1:
                timescale = int.from_bytes(data[ilo + 20 : ilo + 24], "big")
                duration = int.from_bytes(data[ilo + 24 : ilo + 32], "big")
            else:
                timescale = int.from_bytes(data[ilo + 12 : ilo + 16], "big")
                duration = int.from_bytes(data[ilo + 16 : ilo + 20], "big")
            if not timescale:
                raise ValueError("MP4 mvhd timescale is zero")
            return duration * 1000 // timescale
    raise ValueError("MP4 has no moov/mvhd box")


def _strict_decode(kind: str, data: bytes) -> tuple[int | None, int | None, int | None]:
    """(width, height, duration_ms) from the real container header.

    Prefers PIL for images when available (full decoder); falls back to
    the header parsers above. Raises ``ValueError`` on malformed payloads
    and ``NotImplementedError`` for media kinds with no parser.
    """
    if kind == "image":
        try:  # optional dependency: full decode when present
            import io

            from PIL import Image  # type: ignore

            with Image.open(io.BytesIO(data)) as im:
                return im.width, im.height, None
        except ImportError:
            pass
        w, h = _image_dimensions(data)
        return w, h, None
    if kind == "audio":
        return None, None, _wav_duration_ms(data)
    if kind == "video":
        return None, None, _mp4_duration_ms(data)
    raise NotImplementedError(f"no strict decoder for media kind {kind!r}")


def extract_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    In ``strict`` mode the dimensions/duration come from a REAL decode of
    the payload: PIL when installed, else the pure-Python PNG/JPEG/WAV/MP4
    header parsers above — malformed payloads raise. Non-strict mode emits
    deterministic fakes derived from the bytes so batch shape, schema, and
    partitioning are testable with arbitrary payloads (pixel-level feature
    extraction beyond the header remains out of scope without PIL/ffmpeg).
    """

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                data = bytes(payload)
                digest = hashlib.sha256(data).digest()
                if strict:
                    w, h, dur = _strict_decode(kind, data)
                else:
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

    In ``strict`` mode the sampling timeline comes from the real MP4
    mvhd duration (malformed payloads raise); non-strict uses the
    deterministic fake duration. Frame keys are content-derived in both
    modes — actual pixel extraction is the downstream decode stage's job.
    The exploded shape (media_id, frame_idx, frame_ts_ms, frame_key) is
    the real contract a downstream embedding stage consumes.
    """

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                if kind != "video":
                    continue
                data = bytes(payload)
                digest = hashlib.sha256(data).digest()
                if strict:
                    dur = _mp4_duration_ms(data)
                else:
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

    Pixel resampling genuinely needs a raster decoder: with PIL installed
    ``strict`` mode resizes for real (PNG output); without it, strict
    validates the container header (malformed → ``ValueError``) and then
    raises ``NotImplementedError`` at the exact resample call. Non-strict
    mode emits a deterministic fake thumbnail (the sha256 stream of the
    payload truncated to ``target_w*target_h//64`` bytes) — size-
    proportional, so partition sizing and Arrow batch shape behave like a
    real thumbnail column. Non-image rows pass through untouched-by-Python
    via the early filter (column pruning keeps their payloads unread).
    """

    n_bytes = max(1, target_w * target_h // 64)

    def _strict_resize(data: bytes) -> tuple[int, int, bytes]:
        try:
            import io

            from PIL import Image  # type: ignore
        except ImportError:
            _image_dimensions(data)  # malformed payloads fail loudly first
            raise NotImplementedError(
                "pixel resample requires PIL/pillow (header validated OK)"
            )
        with Image.open(io.BytesIO(data)) as im:
            out = io.BytesIO()
            im.resize((target_w, target_h)).save(out, format="PNG")
            return target_w, target_h, out.getvalue()

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload)
                if strict:
                    w, h, thumb = _strict_resize(data)
                    rows.append(
                        {"media_id": mid, "width": w, "height": h, "thumb": thumb}
                    )
                    continue
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
