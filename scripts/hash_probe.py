"""Identify the driver's hash function: compute candidate hashes over
(Spark toPandas, DuckDB .df()) for every driver-checked query and find
the candidate whose match/mismatch pattern reproduces
CORRECTNESS_r01.json exactly.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"


def h_pandas_sum(df):
    """pd.util.hash_pandas_object, order-insensitive via sum."""
    d = df[sorted(df.columns)]
    try:
        return int(pd.util.hash_pandas_object(d, index=False).sum())
    except TypeError:
        return "unhashable"


def h_str_multiset(df):
    d = df[sorted(df.columns)]
    rows = sorted(tuple(str(v) for v in row) for row in d.itertuples(index=False))
    return hash(tuple(rows))


def h_repr_multiset(df):
    d = df[sorted(df.columns)]
    rows = sorted(tuple(repr(v) for v in row) for row in d.itertuples(index=False))
    return hash(tuple(rows))


def h_ordered_str(df):
    d = df[sorted(df.columns)]
    rows = tuple(tuple(str(v) for v in row) for row in d.itertuples(index=False))
    return hash(rows)


def h_csv(df):
    d = df[sorted(df.columns)]
    return hash(d.to_csv(index=False))


def h_values_sorted_str(df):
    """Per-column sorted stringified values (column-independent multiset)."""
    d = df[sorted(df.columns)]
    return hash(tuple(tuple(sorted(str(v) for v in d[c])) for c in d.columns))


def h_json_sorted(df):
    d = df[sorted(df.columns)]
    recs = sorted(json.dumps(list(map(str, row)), default=str) for row in d.itertuples(index=False))
    return hash(tuple(recs))


CANDIDATES = {
    "pandas_sum": h_pandas_sum,
    "str_multiset": h_str_multiset,
    "repr_multiset": h_repr_multiset,
    "ordered_str": h_ordered_str,
    "csv": h_csv,
    "col_sorted_str": h_values_sorted_str,
}


def main():
    from extract_transform_load_spark.session import get_spark
    from extract_transform_load_spark.plans.registry import REGISTRY
    from tests.oracle_harness import duckdb_run_df

    with open("CORRECTNESS_r01.json") as f:
        truth = json.load(f)

    spark = get_spark()
    rows = []
    for name, rec in truth.items():
        if rec.get("err") == "no_oracle" or rec.get("hash_match") is None:
            continue
        spec = REGISTRY[name]
        sp = spec.fn(spark, SF_DIR).toPandas()
        dp = duckdb_run_df(spec.oracle, SF_DIR)
        res = {"name": name, "driver": rec["hash_match"]}
        for cname, fn in CANDIDATES.items():
            try:
                res[cname] = fn(sp) == fn(dp)
            except Exception as e:  # noqa: BLE001
                res[cname] = f"ERR:{type(e).__name__}"
        rows.append(res)
        print(res, flush=True)

    print("\n=== candidate accuracy vs driver ===")
    for cname in CANDIDATES:
        agree = sum(1 for r in rows if r[cname] == r["driver"])
        fp = [r["name"] for r in rows if r[cname] is True and not r["driver"]]
        fn_ = [r["name"] for r in rows if r[cname] is False and r["driver"]]
        print(f"{cname}: {agree}/{len(rows)} agree; green-but-driver-red={fp}; red-but-driver-green={fn_}")


if __name__ == "__main__":
    main()
