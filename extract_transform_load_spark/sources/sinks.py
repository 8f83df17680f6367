"""Serving-layer sinks: JDBC (Postgres) and CSV export.

The reference loads into Postgres with multi-row batched VALUES inserts
and `ON CONFLICT DO NOTHING` idempotency (`dao/postgre/ls_opening.rs:
69-192`), pools 5 connections, and caps statements at 60 s
(`configuration.rs:893-906`). The Spark equivalent is ``df.write.jdbc``
with bounded ``numPartitions`` (each partition is one connection — match
the reference's pool discipline) and ``batchsize`` (the multi-row VALUES
analogue). CSV export mirrors `csv_response.rs:7-55` (`?format=csv`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    user: str | None = None,
    password: str | None = None,
    batchsize: int = 10_000,
    num_partitions: int = 5,
    isolation: str = "READ_COMMITTED",
    driver: str | None = None,
) -> None:
    """Append a DataFrame to a JDBC table.

    ``num_partitions=5`` mirrors the reference's max-5-connection pool —
    a serving Postgres should never see one connection per Spark core.
    Idempotency: pre-filter with ``pipeline.ingest.idempotent_append``
    against the existing keys, or point ``table`` at a staging table and
    merge server-side; plain JDBC append has no ON CONFLICT equivalent.
    The end-to-end path (write → read → insert-if-absent replay) is
    exercised against embedded Derby in tests/test_pipeline.py.
    """
    writer = (
        df.coalesce(num_partitions)
        .write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .option("isolationLevel", isolation)
        .mode(mode)
    )
    if user is not None:
        writer = writer.option("user", user)
    if password is not None:
        writer = writer.option("password", password)
    if driver is not None:
        writer = writer.option("driver", driver)
    writer.save()


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    user: str | None = None,
    password: str | None = None,
    driver: str | None = None,
    fetchsize: int = 10_000,
) -> DataFrame:
    """Read a JDBC table (the replay/backfill side of the idempotent
    append: load existing keys, anti-join the batch, append the rest)."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("fetchsize", str(fetchsize))
    )
    if user is not None:
        reader = reader.option("user", user)
    if password is not None:
        reader = reader.option("password", password)
    if driver is not None:
        reader = reader.option("driver", driver)
    return reader.load()


def to_csv_string(df: DataFrame, limit: int | None = None) -> str:
    """Small-result CSV export (the API attachment path, `csv_response.rs`).

    Driver-side by design: export endpoints are capped result sets
    (limit <= 100 in the reference). For bulk extracts use
    ``write_csv_dir`` instead — never collect a big frame.
    """
    pdf = (df.limit(limit) if limit else df).toPandas()
    return pdf.to_csv(index=False)


def write_csv_dir(df: DataFrame, path: str, header: bool = True) -> None:
    """Distributed CSV extract for bulk exports."""
    df.write.option("header", str(header).lower()).mode("overwrite").csv(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    quarantine: bool = True,
) -> DataFrame:
    """JSON-Lines corpus reader — the interchange format training-data
    pipelines actually move documents in (one JSON object per line;
    gzip transparent via the path's extension).

    Always pass ``schema`` in production: without one, Spark runs a
    SEPARATE full scan just to infer types — at 100 TB that doubles the
    read before the first real job, and a rare malformed field can
    silently widen a column to string for the whole corpus. Records
    that don't parse land in ``_corrupt_record`` (PERMISSIVE mode, the
    default) instead of failing the scan, so a curation job can count
    and quarantine them — the same keep-the-pipeline-alive posture as
    the live feed's skip-after-retries.

    Spark gotcha this function closes (round-7 ADVICE fix): with a
    USER-SUPPLIED schema, PERMISSIVE mode only captures corrupt records
    when the schema itself contains the ``_corrupt_record`` string
    column — otherwise bad lines silently become all-null rows. So when
    a schema is passed without that column, it is appended here (to a
    COPY — ``StructType.add`` mutates in place, and a caller's shared
    schema object must not grow a column as a side effect). Quarantine
    is then ``df.filter("_corrupt_record IS NOT NULL")`` regardless of
    how the caller spelled the schema. Appending a column is a schema
    change the caller must opt OUT of when it matters (round-8 ADVICE):
    pass ``quarantine=False`` to keep the supplied schema byte-for-byte
    (for unions, fixed-schema sinks, column-set comparisons) — bad lines
    then become all-null rows, Spark's plain user-schema PERMISSIVE
    behavior. Note Spark refuses a query
    whose only referenced column is the internal corrupt-record column
    (UNSUPPORTED_FEATURE): select at least one data column alongside it
    (as the test does), or ``df.cache()`` first, before counting the
    quarantined rows.
    """
    reader = spark.read
    if schema is not None:
        if isinstance(schema, str):
            schema = StructType.fromDDL(schema)
        if quarantine and "_corrupt_record" not in schema.fieldNames():
            schema = StructType(list(schema.fields)).add("_corrupt_record", "string")
        reader = reader.schema(schema)
    return reader.json(path)


def write_jsonl_dir(df: DataFrame, path: str, compression: str | None = "gzip") -> None:
    """Distributed JSON-Lines extract (one object per line, one file per
    partition — the shard layout downstream tokenizer/loader fleets
    expect). Compression defaults to gzip: JSONL text compresses ~10x
    and decompression parallelizes per FILE, so shard count (the
    DataFrame's partitioning) stays the parallelism knob."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
