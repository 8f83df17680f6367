"""OFFSET/LIMIT pagination with a total order.

The reference paginates every list endpoint with ``ORDER BY ts DESC
OFFSET $ LIMIT $`` and caps ``limit <= 100`` (SURVEY.md §2.B sorts/limits;
`controller/leases.rs:45-47`). Spark has ``offset()`` since 3.4, but an
explicit ``row_number`` filter keeps the semantics obvious and lets the
caller get the absolute rank back.

Determinism: callers MUST pass a sort that is a total order (include a
unique key as final tiebreak) — otherwise page boundaries are
nondeterministic in any distributed engine.

Scale note: pagination implies a global sort of the filtered set. That is
correct for serving-path queries (post-filter cardinality is small); for
deep scans prefer keyset pagination (``WHERE ts < last_seen`` + LIMIT),
which pushes the predicate into the scan instead of sorting everything.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def paginate(
    df: DataFrame,
    order_by: Sequence[Column],
    offset: int = 0,
    limit: int = 100,
    max_limit: int = 100,
) -> DataFrame:
    limit = min(limit, max_limit)
    w = Window.orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") > offset) & (F.col("__rn") <= offset + limit))
        .drop("__rn")
    )
