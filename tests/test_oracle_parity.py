"""Every registry query with an oracle must match DuckDB exactly —
this is a local replica of the driver's t2 correctness gate.

Two layers:
- ``compare`` — semantic parity on canonicalized Python values
  (collect vs fetchall), catches wrong results.
- ``strict_compare`` — the DRIVER-strict replica: Spark ``toPandas()``
  vs DuckDB ``.df()``, cell-level ``str`` equality over the
  order-insensitive row multiset. DuckDB's pandas path collapses
  DECIMAL/HUGEINT to float64, so this layer red-flags any Decimal or
  int128 that leaks into a final projection — exactly what the driver's
  value hash sees (the round-1 cause of 19 hash-fails on numerically
  identical results).

Default fixture SF is sf0.001 for speed; the driver gate runs sf0.01 —
replicate before shipping with
``SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01``.
"""

from __future__ import annotations

import pytest

from extract_transform_load_spark.plans.registry import REGISTRY

from .oracle_harness import compare, strict_compare

ORACLE_QUERIES = sorted(name for name, spec in REGISTRY.items() if spec.oracle)
ROWS_ONLY_QUERIES = sorted(name for name, spec in REGISTRY.items() if not spec.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity_driver_strict(spark, sf_dir, name):
    """Validates the CANONICAL pair — the exact surface the driver sees
    via ``__spark_entry__.queries()`` / ``oracle_sql()`` — with the
    order-sensitive gate: identical row sequences, positional column
    parity, cell-level str equality. Robust under any hash family.

    Full driver-scale replica: ``python scripts/verify_driver_gate.py``
    (sf0.01, all 110 queries, ~3.5 min)."""
    spec = REGISTRY[name]
    df = spec.canonical_fn(spark, sf_dir)
    problems = strict_compare(df, spec.canonical_oracle, sf_dir, ordered=True)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_semantic_compare_agrees_on_flagship(spark, sf_dir):
    """The looser canonical comparison stays wired (guards the harness
    itself); one representative query keeps it exercised."""
    spec = REGISTRY["q01_pricing_summary"]
    problems = compare(spec.fn(spark, sf_dir), spec.oracle, sf_dir)
    assert not problems, "; ".join(problems)


def test_every_query_has_an_oracle():
    """Registry policy since round 2: no rows-only queries. An operator
    whose semantics aren't directly SQL-expressible registers a derived
    oracle (full replication, verified candidates, or an invariant
    audit) instead of None — see plans/datapipe.py module docstring."""
    assert ROWS_ONLY_QUERIES == [], ROWS_ONLY_QUERIES
