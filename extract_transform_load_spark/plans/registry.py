"""Query registry — the engine's public query surface.

Each entry couples a Spark DataFrame builder with an equivalent ANSI-SQL
oracle string (run by DuckDB on the same parquet tables). The driver's
correctness gate compares row count, schema, and an order-insensitive
value hash — so builders must alias every computed column to the same
name the oracle uses, keep numeric types engine-portable (see
``functions.decimals``), and give any LIMIT/OFFSET query a total order.

Queries whose semantics aren't directly SQL-expressible (LSH banding,
ANN, sketches, BPE, packing) register a DERIVED oracle instead of none:
either a full deterministic replication in SQL, or exact SQL-derivable
columns plus in-query-proven booleans (recall floors, error bounds,
losslessness) the oracle pins TRUE — see plans/datapipe.py. Result-layer
columns are always double/bigint/string/date/timestamp/bool, never
DECIMAL: the driver's pandas conversion collapses DuckDB DECIMAL and
HUGEINT to float64, so a Spark-side Decimal hash-mismatches numerically
identical values (functions/decimals.dsumd).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register a (spark, sf_dir) -> DataFrame builder."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
