from .tables import TABLES, load, load_all  # noqa: F401
from .blockfeed import register_blockfeed, subscribe_blocks  # noqa: F401
from .livefeed import (  # noqa: F401
    compact_landing,
    http_block_fetcher,
    reconcile_gaps,
    run_live_session,
    run_supervised,
)
from .ws import CircuitBreaker, WSClient, with_retry  # noqa: F401
