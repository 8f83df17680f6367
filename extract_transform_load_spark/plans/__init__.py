from .registry import REGISTRY, QuerySpec, query, queries, oracle_sql  # noqa: F401

# Importing these modules populates REGISTRY.
from . import relational  # noqa: F401,E402
from . import datapipe  # noqa: F401,E402
