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

# Output types that cannot anchor a deterministic total ORDER BY (maps
# aren't orderable in Spark). Queries whose outputs include one keep the
# raw form on the driver surface.
_UNORDERABLE_TYPES = ("map<",)


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""
    canonical: bool = True

    @property
    def canonical_fn(self) -> QueryFn:
        """Driver-surface form: the raw plan plus a total ORDER BY over
        every output column (ascending, NULLS FIRST — Spark's default,
        pinned explicitly). Pure comparison insurance: the driver's
        value hash should be order-insensitive (round-1 evidence), but a
        deterministic total order makes the result robust under *any*
        hash family. Plan audits and the bench use ``fn`` — the sort is
        not part of the operator, only of the cross-engine contract.
        """
        if not self.canonical:
            return self.fn
        raw = self.fn

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            import pyspark.sql.functions as F

            df = raw(spark, sf_dir)
            if any(
                f.dataType.simpleString().startswith(_UNORDERABLE_TYPES)
                for f in df.schema.fields
            ):
                return df
            return df.orderBy(*[F.col(c).asc_nulls_first() for c in df.columns])

        wrapped.__doc__ = raw.__doc__
        wrapped.__name__ = getattr(raw, "__name__", self.name)
        return wrapped

    @property
    def canonical_oracle(self) -> str | None:
        """Oracle twin of ``canonical_fn``: the same total order via
        DuckDB's ORDER BY ALL (positional over the select list — which a
        registry test pins equal to the Spark column order) with NULLS
        FIRST matching Spark's asc_nulls_first. NaN sorts greatest in
        both engines."""
        if self.oracle is None or not self.canonical:
            return self.oracle
        return (
            "SELECT * FROM (\n"
            + self.oracle.strip()
            + "\n) AS __canon ORDER BY ALL NULLS FIRST"
        )


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, doc: str = "", canonical: bool = True):
    """Decorator: register a (spark, sf_dir) -> DataFrame builder."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(
            name=name,
            fn=fn,
            oracle=oracle,
            doc=doc or (fn.__doc__ or ""),
            canonical=canonical,
        )
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    """Driver surface: canonically-ordered form of every registered plan."""
    return {name: spec.canonical_fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.canonical_oracle
        for name, spec in REGISTRY.items()
        if spec.oracle is not None
    }
