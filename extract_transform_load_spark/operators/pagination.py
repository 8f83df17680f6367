"""OFFSET/LIMIT pagination with a total order.

The reference paginates every list endpoint with ``ORDER BY ts DESC
OFFSET $ LIMIT $`` and caps ``limit <= 100`` (SURVEY.md §2.B sorts/limits;
`controller/leases.rs:45-47`).

Determinism: callers MUST pass a sort that is a total order (include a
unique key as final tiebreak) — otherwise page boundaries are
nondeterministic in any distributed engine.

Scale note: ``orderBy().offset().limit()`` plans as
TakeOrderedAndProject — each partition keeps its top-(offset+limit)
rows and the driver merges, so no global sort and no single-task
``row_number`` window exists anywhere in the plan (plan-audited in
tests/test_plan_audit.py). The cost still grows with the page DEPTH
(every partition holds offset+limit rows), so offsets past
``max_offset`` raise and direct callers to ``keyset_page``, whose
cursor predicate pushes into the scan and makes page N cost page-1
money.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

MAX_OFFSET_DEFAULT = 100_000


def paginate(
    df: DataFrame,
    order_by: Sequence[Column],
    offset: int = 0,
    limit: int = 100,
    max_limit: int = 100,
    max_offset: int = MAX_OFFSET_DEFAULT,
) -> DataFrame:
    limit = min(limit, max_limit)
    if offset > max_offset:
        raise ValueError(
            f"offset {offset} exceeds max_offset {max_offset}: deep pages "
            "must use keyset_page (cursor pagination) — offset pagination "
            "keeps offset+limit rows per partition"
        )
    return df.orderBy(*order_by).offset(offset).limit(limit)


def keyset_page(
    df: DataFrame,
    key_cols: Sequence[str],
    after: Sequence | None = None,
    limit: int = 100,
    descending: bool | Sequence[bool] = False,
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

    ``descending`` is one flag for all keys or one per key — the list
    endpoints sort (ts DESC, id ASC), so per-key directions flip each
    key's comparison in the lexicographic expansion independently.
    """
    limit = min(limit, max_limit)
    keys = [F.col(c) for c in key_cols]
    desc = (
        list(descending)
        if isinstance(descending, (list, tuple))
        else [descending] * len(keys)
    )
    if len(desc) != len(keys):
        raise ValueError("descending arity must match key_cols")
    if after is not None:
        if len(after) != len(keys):
            raise ValueError("cursor arity must match key_cols")
        pred = None
        for i, (k, v, d) in enumerate(zip(keys, after, desc)):
            clause = (k < F.lit(v)) if d else (k > F.lit(v))
            for kk, vv in list(zip(keys, after))[:i]:
                clause = (kk == F.lit(vv)) & clause
            pred = clause if pred is None else (pred | clause)
        df = df.filter(pred)
    order = [k.desc() if d else k.asc() for k, d in zip(keys, desc)]
    return df.orderBy(*order).limit(limit)
