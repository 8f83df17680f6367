"""extract_transform_load_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of
the reference blockchain-ETL service (nolus-protocol/extract-transform-load),
re-expressed Spark-first: declarative DataFrame/SQL plans optimized by
Catalyst, medallion layout (bronze events -> silver entities -> gold
queries), plus large-scale training-data-pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing).

Layout
------
- ``session``    : SparkSession factory with scale-oriented defaults (AQE,
                   UTC, Arrow, tuned shuffle partitions).
- ``sources``    : parquet table loaders, bronze event-stream schemas,
                   JDBC sink helpers.
- ``operators``  : reusable distributed operators (as-of join,
                   latest-per-key, gap detection, pagination, dedup
                   family, similarity search, text analysis, multimodal).
- ``functions``  : column-level helpers (decimal policy, time windows,
                   financial math).
- ``plans``      : the query registry — every query from the reference's
                   API surface (SURVEY.md §2.B) as a named DataFrame
                   builder with a DuckDB oracle SQL twin.
- ``pipeline``   : the ingest/transform dataflow (event parsing,
                   enrichment, state snapshots, PnL) — SURVEY.md §2.A.
- ``streaming``  : Structured Streaming ingest variant.
"""

__version__ = "0.1.0"
