from .ingest import deduped_stream, start_silver_stream  # noqa: F401
from .joins import interval_join  # noqa: F401
