"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose the full registry from
``extract_transform_load_spark.plans`` (one entry per implemented
operator from SURVEY.md §2, each oracle-checked against DuckDB by the
driver at sf0.01).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from extract_transform_load_spark.plans import registry as _registry  # noqa: E402
from extract_transform_load_spark import plans as _plans  # noqa: E402,F401
from extract_transform_load_spark.session import tune_for_session  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (grouped pricing summary) on /root/testdata/sf0.001."""
    tune_for_session(spark)
    return _registry.REGISTRY["q01_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def _wrap(fn):
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        tune_for_session(spark)
        return fn(spark, sf_dir)

    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _wrap(fn) for name, fn in _registry.queries().items()}


def oracle_sql() -> dict[str, str]:
    return _registry.oracle_sql()
