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


def keyset_page(
    df: DataFrame,
    key_cols: Sequence[str],
    after: Sequence | None = None,
    limit: int = 100,
    descending: bool = False,
    max_limit: int = 100,
) -> DataFrame:
    """Keyset (cursor) pagination — the deep-scan path.

    ``after`` is the composite key of the previous page's last row; the
    next page is ``WHERE key > after ORDER BY key LIMIT n`` with the
    tuple comparison expanded into the standard lexicographic predicate
    ``k1 > a1 OR (k1 = a1 AND k2 > a2) OR ...``. Unlike OFFSET, the
    predicate pushes into the parquet scan (row-group min/max skipping,
    partition pruning when the leading key is the partition column) and
    no row_number over a global sort is needed — page N costs the same
    as page 1. ``key_cols`` must form a unique composite key.
    """
    limit = min(limit, max_limit)
    keys = [F.col(c) for c in key_cols]
    if after is not None:
        if len(after) != len(keys):
            raise ValueError("cursor arity must match key_cols")
        gt = (lambda c, v: c < F.lit(v)) if descending else (lambda c, v: c > F.lit(v))
        pred = None
        for i, (k, v) in enumerate(zip(keys, after)):
            clause = gt(k, v)
            for kk, vv in list(zip(keys, after))[:i]:
                clause = (kk == F.lit(vv)) & clause
            pred = clause if pred is None else (pred | clause)
        df = df.filter(pred)
    order = [k.desc() for k in keys] if descending else [k.asc() for k in keys]
    return df.orderBy(*order).limit(limit)
