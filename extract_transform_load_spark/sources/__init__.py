from .tables import TABLES, load, load_all  # noqa: F401
from .blockfeed import register_blockfeed, subscribe_blocks  # noqa: F401
