from .ingest import deduped_stream, start_silver_stream  # noqa: F401
