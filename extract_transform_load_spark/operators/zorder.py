"""Z-order (Morton) keys — multi-dimensional data-layout clustering.

At 100 TB the scan is the query plan's floor: a table range-partitioned
on ONE column prunes on that column only, and every predicate on a
second dimension reads everything. Interleaving the bits of several
quantized dimensions into one Morton key (Morton 1966; the technique
behind Delta/Databricks OPTIMIZE ZORDER BY and Hudi/Iceberg clustering
— all public) gives a single sort key whose locality is shared across
ALL participating columns: rows close in z are close in every
dimension, so per-file min/max stats stay narrow on each column and a
predicate on any of them prunes most files.

Two pieces, deliberately separated:

- :func:`zorder_key` — adds the ``zval`` column. One tiny min/max
  aggregate per call (a single scan job, exact integer/double math),
  then a scan-local projection: linear quantization of each column to
  ``bits`` bits against its [min, max] range, then bit interleave via
  shift/or — pure JVM expressions, NO exchange, NO window (the naive
  rank/ntile quantization would need a single-partition global window,
  which is exactly what cannot run at scale; value-based quantization
  costs one agg and parallelizes perfectly).
- :func:`write_zordered` — the layout writer: range-partition by
  ``zval`` (sampled range exchange — the scalable global ordering
  mechanism, never a single-task sort) and sort within partitions, so
  every output file covers a narrow z-range and therefore a narrow
  range of every clustered column.

Determinism (the oracle contract): quantization is
``least(2^bits - 1, greatest(0, floor((x - min) / (max - min) *
2^bits)))`` over doubles — IEEE arithmetic with an identical expression
shape evaluates bit-equal in Spark and DuckDB, and the interleave is
integer shifts/ors. NULLs quantize to bucket 0 (they sort first, like
NULLS FIRST); a constant column (max == min) contributes bucket 0
everywhere rather than dividing by zero.

Reference parity: the reference stores rows in Postgres with B-tree
indexes (SURVEY §4) — single-column locality. This operator is the
columnar-lake equivalent for the multi-column case; beyond-reference
LLM-pipeline/layout layer.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _bucket(col: Column, lo: float, hi: float, levels: int) -> Column:
    """Quantize to [0, levels-1] — exact double math, NULL/constant -> 0."""
    if hi <= lo:  # constant or empty column: one bucket
        return F.lit(0).cast("bigint")
    raw = F.floor(
        (col.cast("double") - F.lit(float(lo)))
        / F.lit(float(hi) - float(lo))
        * F.lit(float(levels))
    )
    return F.coalesce(
        F.least(F.lit(levels - 1), F.greatest(F.lit(0), raw)), F.lit(0)
    ).cast("bigint")


def zorder_key(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 8,
    out_col: str = "zval",
) -> DataFrame:
    """Add a Morton key over ``cols`` (each linearly quantized to
    ``bits`` bits against its observed [min, max]). ``len(cols) * bits``
    must fit a signed 64-bit key (<= 62)."""
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    if bits < 1 or len(cols) * bits > 62:
        raise ValueError(
            f"bits={bits} over {len(cols)} columns needs {len(cols) * bits} "
            "key bits; the Morton key must fit int64 (<= 62)"
        )
    # one exact min/max scan — the only job this operator runs eagerly;
    # everything after is a scan-local projection
    aggs = []
    for c in cols:
        aggs += [
            F.min(F.col(c).cast("double")).alias(f"__min_{c}"),
            F.max(F.col(c).cast("double")).alias(f"__max_{c}"),
        ]
    stats = df.agg(*aggs).first()
    levels = 1 << bits

    z = F.lit(0).cast("bigint")
    for i, c in enumerate(cols):
        lo, hi = stats[f"__min_{c}"], stats[f"__max_{c}"]
        if lo is None:  # all-NULL column: contributes bucket 0
            continue
        b = _bucket(F.col(c), lo, hi, levels)
        # interleave: bit j of column i lands at position j*ncols + i —
        # the canonical Morton layout, so equal prefixes = close in
        # every dimension
        for j in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(b, j).bitwiseAND(F.lit(1)),
                    j * len(cols) + i,
                )
            )
    return df.withColumn(out_col, z)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 8,
    partitions: int | None = None,
) -> None:
    """Materialize ``df`` range-partitioned and sorted by its Morton
    key: every output file then covers a narrow range of EVERY column
    in ``cols``, so min/max file pruning works for predicates on any of
    them. The range exchange samples boundaries (never a single-task
    global sort); the key column itself is dropped from the files."""
    keyed = zorder_key(df, cols, bits=bits)
    parted = (
        keyed.repartitionByRange(partitions, "zval")
        if partitions
        else keyed.repartitionByRange("zval")
    )
    parted.sortWithinPartitions("zval").drop("zval").write.mode(
        "overwrite"
    ).parquet(path)
