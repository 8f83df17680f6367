from .asof import as_of_join  # noqa: F401
from .gaps import find_gaps  # noqa: F401
from .latest import latest_per_key  # noqa: F401
from .pagination import paginate  # noqa: F401
