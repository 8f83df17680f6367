"""Replica of the driver's correctness gate: run a registry query in
Spark and its oracle SQL in DuckDB over the same parquet tables, then
compare row count, column names, and order-insensitive values.

Comparison is strict-by-default (exact after canonicalization) so any
engine-semantics drift (decimal scale, timestamp tz, float rounding)
surfaces locally before the driver sees it.
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_run(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def _canon(v):
    if v is None:
        return "∅"
    if isinstance(v, Decimal):
        # normalize away scale: 1.4500 == 1.45
        return f"dec:{v.normalize()}"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"f:{v!r}"
    if isinstance(v, datetime):
        return f"ts:{v.replace(tzinfo=None).isoformat()}"
    if isinstance(v, date):
        return f"d:{v.isoformat()}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return f"{type(v).__name__}:{v}"


def canonical_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


def duckdb_run_df(sql: str, sf_dir: str):
    """Driver-path DuckDB run: pandas conversion via ``.df()``.

    This is the lossy path the driver uses — DECIMAL and HUGEINT columns
    come back as float64, so ``str()`` of a cell differs from Spark's
    ``Decimal`` repr whenever the value has trailing zeros or >15
    significant digits. The strict gate below therefore compares the
    *pandas* representations, exactly what the driver's hash sees.
    """
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    df = con.execute(sql).df()
    con.close()
    return df


def _strict_cell(v) -> str:
    # str() of the pandas-level value: what an order-insensitive value
    # hash over stringified cells would consume. NaN/None/NaT all narrow
    # to a single null token (engines agree on nullness, not its repr).
    if v is None:
        return "∅"
    if isinstance(v, float) and math.isnan(v):
        return "∅"
    if v.__class__.__name__ in ("NaTType",):
        return "∅"
    if isinstance(v, Decimal):
        return f"DECIMAL!{v}"  # intentionally loud: decimals must not reach output
    if hasattr(v, "to_pydatetime"):  # pd.Timestamp
        v = v.to_pydatetime()
    if isinstance(v, datetime):
        # DuckDB's pandas path widens DATE to datetime64[us]; the driver
        # hashes Spark's datetime.date equal to the midnight timestamp
        # (CORRECTNESS_r01: q13/q31 green), so normalize midnight → date.
        v = v.replace(tzinfo=None)
        if v.hour == v.minute == v.second == v.microsecond == 0:
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if hasattr(v, "tolist") and not isinstance(v, (str, bytes)):  # numpy scalar/array
        return _strict_cell(v.tolist())
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_strict_cell(x) for x in v) + "]"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, float):
        return f"f:{v!r}"
    return str(v)


def strict_compare(spark_df, oracle: str, sf_dir: str, ordered: bool = False) -> list[str]:
    """Driver-strict gate: Spark ``toPandas()`` vs DuckDB ``.df()``,
    cell-level ``str`` equality over the row multiset.

    Any mismatch here is a mismatch in the driver's value hash. In
    particular a ``Decimal`` object on the Spark side vs a float64 on
    the DuckDB side fails even when numerically equal — final
    projections must cast aggregates to DOUBLE/BIGINT on BOTH sides
    (the round-1 root cause of all 19 driver hash-fails).

    ``ordered=True`` validates the canonical driver-surface pair
    (``QuerySpec.canonical_fn`` / ``canonical_oracle``): row SEQUENCES
    must match exactly and so must positional column order (DuckDB's
    ``ORDER BY ALL`` is positional over the select list, Spark's
    ``orderBy`` over ``df.columns`` — identical orders require identical
    column sequences). Passing this gate makes the result robust under
    order-sensitive AND order-insensitive hash families.
    """
    problems: list[str] = []
    sp = spark_df.toPandas()
    dp = duckdb_run_df(oracle, sf_dir)
    if sorted(sp.columns) != sorted(dp.columns):
        return [f"columns differ: spark={sorted(sp.columns)} duckdb={sorted(dp.columns)}"]
    if ordered and list(sp.columns) != list(dp.columns):
        problems.append(
            f"positional column order differs (breaks ORDER BY ALL parity): "
            f"spark={list(sp.columns)} duckdb={list(dp.columns)}"
        )
    if len(sp) != len(dp):
        problems.append(f"row count differs: spark={len(sp)} duckdb={len(dp)}")
    sp = sp[sorted(sp.columns)]
    dp = dp[sorted(dp.columns)]
    # No dtype comparison: the driver hashes values, not dtypes, and the
    # benign object-date vs datetime64 pairing is dtype-different but
    # hash-equal. Consequential drift (Decimal vs float64, int64 vs
    # float64) changes the cell strings and fails below.
    srows = [tuple(_strict_cell(v) for v in row) for row in sp.itertuples(index=False)]
    drows = [tuple(_strict_cell(v) for v in row) for row in dp.itertuples(index=False)]
    if ordered and len(srows) == len(drows) and srows != drows:
        first = next(i for i, (a, b) in enumerate(zip(srows, drows)) if a != b)
        problems.append(
            f"row order differs at index {first}: spark={srows[first]} duckdb={drows[first]}"
        )
    srows = sorted(srows)
    drows = sorted(drows)
    if srows != drows:
        dset = set(drows)
        sset = set(srows)
        only_s = [r for r in srows if r not in dset][:3]
        only_d = [r for r in drows if r not in sset][:3]
        problems.append(f"values differ; spark-only={only_s} duckdb-only={only_d}")
    return problems


def compare(spark_df, oracle: str, sf_dir: str) -> list[str]:
    """Returns a list of mismatch descriptions; empty list == pass."""
    problems: list[str] = []
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols, d_rows = duckdb_run(oracle, sf_dir)
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(f"row count differs: spark={len(s_rows)} duckdb={len(d_rows)}")
    sc = canonical_rows(s_cols, s_rows)
    dc = canonical_rows(d_cols, d_rows)
    if sc != dc:
        only_s = [r for r in sc if r not in set(dc)][:5]
        only_d = [r for r in dc if r not in set(sc)][:5]
        problems.append(f"values differ; spark-only={only_s} duckdb-only={only_d}")
    return problems
