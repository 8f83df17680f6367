from .asof import as_of_join  # noqa: F401
from .bpe import encode_bpe, learn_bpe  # noqa: F401
from .dedup import exact_duplicates, minhash_lsh_pairs, repeated_spans  # noqa: F401
from .gaps import find_gaps  # noqa: F401
from .latest import latest_per_key  # noqa: F401
from .pagination import paginate  # noqa: F401
from .sampling import (  # noqa: F401
    hash_split,
    importance_logratios,
    mixture_sample,
    temperature_mixture_sample,
)
from .similarity import cosine_topk_bruteforce, semantic_dedup  # noqa: F401
from .spread import spread_small_scan  # noqa: F401
from .textops import winnow_anchor_rows, winnow_summary_rows  # noqa: F401
from .sketches import (  # noqa: F401
    build_distinct_sketches,
    build_quantile_sketches,
    build_theta_sketches,
    merge_distinct_estimate,
    merge_quantile_estimates,
)
