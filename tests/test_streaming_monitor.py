"""Streaming data-quality metrics: the same observe_counts expressions
ride each microbatch and surface in StreamingQueryProgress — the
streaming twin of the batch expectation/monitoring family."""

from __future__ import annotations

import time

import pyspark.sql.functions as F

from extract_transform_load_spark.pipeline.monitor import observe_counts

SCHEMA = "event_id long, value double"


def test_observe_counts_surfaces_per_microbatch_metrics(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(
        [(1, 10.0), (2, None), (3, -4.0), (4, 7.0)], SCHEMA
    ).write.parquet(str(src / "a.parquet"))

    stream = spark.readStream.schema(SCHEMA).parquet(str(src) + "/*")
    instrumented, obs = observe_counts(
        stream,
        {"null_value": F.col("value").isNull(), "negative": F.col("value") < 0},
        name="quality",
    )
    assert obs is None  # streaming path: metrics come from progress
    q = (
        instrumented.writeStream.format("memory")
        .queryName("obs_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        deadline = time.time() + 30
        got = None
        while time.time() < deadline and got is None:
            for p in q.recentProgress:
                m = p["observedMetrics"].get("quality") if p["observedMetrics"] else None
                if m and m["rows"] > 0:
                    got = m
                    break
            if got is None:
                time.sleep(0.5)
    finally:
        q.stop()

    assert got is not None, "no observed metrics in any progress event"
    assert got["rows"] == 4
    assert got["null_value"] == 1
    assert got["negative"] == 1
