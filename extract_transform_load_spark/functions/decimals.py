"""Decimal policy — exact, order-independent aggregation arithmetic.

The reference stores amounts as Postgres DECIMAL(39,0)/(42,0) and prices
as DECIMAL(39,18) (SURVEY.md §1.2). Spark caps DecimalType precision at
38, so the engine-wide policy is DecimalType(38,0) for raw amounts and
DecimalType(38,18) for prices (documented 39→38 narrowing; on-chain u128
amounts are < 1e38 in practice).

A second, equally important reason to aggregate in decimal: **float sums
are order-dependent**. A distributed engine adds partial sums in
nondeterministic partition order, so ``SUM(double)`` is not reproducible
run-to-run, let alone engine-to-engine (the DuckDB oracle). Every sum in
the query layer therefore casts its input to a decimal before
aggregating: exact integer arithmetic, associative, identical in Spark
and DuckDB. Ratios are then computed from the exact decimal sums in
*double* (one IEEE division of identical inputs is bit-reproducible).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

AMOUNT = "decimal(38,0)"
PRICE = "decimal(38,18)"
# Aggregation-input type for double measures: wide enough for any test
# value, narrow enough that products of two stay within precision 38.
MEASURE = "decimal(18,4)"
RESULT = "decimal(38,4)"


def dec(col: Column | str, typ: str = MEASURE) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(typ)


def dsum(col: Column | str, alias: str | None = None, typ: str = MEASURE) -> Column:
    """Exact sum: cast to decimal, sum, fix result type to decimal(38,4)."""
    out = F.sum(dec(col, typ)).cast(RESULT)
    return out.alias(alias) if alias else out


def dsumd(col: Column | str, alias: str | None = None, typ: str = MEASURE) -> Column:
    """Exact decimal sum presented as DOUBLE.

    Aggregation still happens in decimal (order-independent across
    partitions); only the final value is cast. Result-layer columns must
    be double/bigint, never decimal: the correctness driver converts the
    DuckDB oracle through pandas where DECIMAL collapses to float64, so
    a Spark-side ``Decimal('1.4500')`` hash-mismatches the numerically
    equal float ``1.45``. Casting the *identical exact decimal* to
    double on both engines yields bit-equal floats.
    """
    out = F.sum(dec(col, typ)).cast("double")
    return out.alias(alias) if alias else out


def ratio(num: Column, den: Column) -> Column:
    """num/den as double computed from exact (decimal) inputs; NULL if den=0."""
    n = num.cast("double")
    d = den.cast("double")
    return F.when(d != 0, n / d)
