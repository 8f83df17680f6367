"""Bit-level diagnostic: for each named registry query, run Spark and the
DuckDB oracle at sf0.01 and report EVERY representational difference the
driver's hash could see: dtype drift, value drift (bitwise, after a
row-sort on all columns), and raw row-order drift.

Usage: python scripts/driver_diff.py q01_pricing_summary q11_dim_join_rollup ...
       python scripts/driver_diff.py --all
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def normcell(v):
    return repr(v)


def diff_query(spark, name, sf_dir):
    from extract_transform_load_spark.plans.registry import REGISTRY
    from tests.oracle_harness import duckdb_run_df

    spec = REGISTRY[name]
    if spec.oracle is None:
        return ["NO ORACLE"]
    out = []
    sp = spec.fn(spark, sf_dir).toPandas()
    dp = duckdb_run_df(spec.oracle, sf_dir)
    if sorted(sp.columns) != sorted(dp.columns):
        return [f"COLUMNS spark={sorted(sp.columns)} duck={sorted(dp.columns)}"]
    sp = sp[sorted(sp.columns)].reset_index(drop=True)
    dp = dp[sorted(dp.columns)].reset_index(drop=True)
    if len(sp) != len(dp):
        out.append(f"ROWCOUNT spark={len(sp)} duck={len(dp)}")
    for c in sp.columns:
        if str(sp[c].dtype) != str(dp[c].dtype):
            out.append(f"DTYPE {c}: spark={sp[c].dtype} duck={dp[c].dtype}")
        # object columns: compare python types of first non-null
        if str(sp[c].dtype) == "object" or str(dp[c].dtype) == "object":
            st = next((type(v).__name__ for v in sp[c] if v is not None), "?")
            dt = next((type(v).__name__ for v in dp[c] if v is not None), "?")
            if st != dt:
                out.append(f"PYTYPE {c}: spark={st} duck={dt}")
    if len(sp) == len(dp) and len(sp) > 0:
        # row-order-sensitive comparison on stringified cells
        sstr = sp.map(normcell)
        dstr = dp.map(normcell)
        ordered_eq = sstr.equals(dstr)
        key = list(sstr.columns)
        ss = sstr.sort_values(key).reset_index(drop=True)
        ds = dstr.sort_values(key).reset_index(drop=True)
        sorted_eq = ss.equals(ds)
        if not sorted_eq:
            neq = (ss != ds).any(axis=1)
            idx = list(ss.index[neq])[:3]
            for i in idx:
                for c in ss.columns:
                    if ss.at[i, c] != ds.at[i, c]:
                        out.append(f"VALUE row{i} {c}: spark={ss.at[i, c]} duck={ds.at[i, c]}")
        elif not ordered_eq:
            neq = (sstr != dstr).any(axis=1)
            first = list(sstr.index[neq])[:2]
            out.append(f"ROWORDER differs (values equal when sorted); first diff rows {first}")
    return out


def main():
    from extract_transform_load_spark.session import get_spark
    from extract_transform_load_spark.plans.registry import REGISTRY

    names = sys.argv[1:]
    if names == ["--all"]:
        names = list(REGISTRY)
    spark = get_spark()
    for name in names:
        try:
            problems = diff_query(spark, name, SF_DIR)
        except Exception as e:  # noqa: BLE001
            problems = [f"ERROR {type(e).__name__}: {e}"]
        status = "OK" if not problems else "DIFF"
        print(f"== {name}: {status}")
        for p in problems:
            print(f"   {p}")


if __name__ == "__main__":
    main()
