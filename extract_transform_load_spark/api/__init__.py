from .endpoints import ENDPOINTS, endpoint  # noqa: F401
