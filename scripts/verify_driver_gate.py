"""Full replica of the driver's t2 correctness gate at its real scale
factor: run EVERY registry query through the canonical driver surface
(``queries()`` / ``oracle_sql()`` from ``__spark_entry__``) against
DuckDB at sf0.01, with the ORDER-SENSITIVE strict compare.

Usage: python scripts/verify_driver_gate.py [--bare] [name ...]
``--bare`` simulates the driver's own session: a plain builder with no
custom conf (default 200 shuffle partitions, AQE defaults) — everything
must be fixed at runtime by ``tune_for_session`` inside the query
wrappers, and results must not depend on partitioning (tie-breaks,
float-sum order). Exit code 0 == every checked query passes.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    import __spark_entry__ as entrymod
    from tests.oracle_harness import strict_compare

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    args = sys.argv[1:]
    bare = "--bare" in args
    names = [a for a in args if a != "--bare"] or list(qs)
    if bare:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[8]").getOrCreate()
    else:
        from extract_transform_load_spark.session import get_spark

        spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    failures = 0
    t_all = time.time()
    for name in names:
        t0 = time.time()
        try:
            df = qs[name](spark, SF_DIR)
            if name not in oracles:
                n = df.count()
                print(f"ROWS-ONLY {name}: {n} rows ({time.time()-t0:.1f}s)", flush=True)
                continue
            problems = strict_compare(df, oracles[name], SF_DIR, ordered=True)
        except Exception as e:  # noqa: BLE001
            problems = [f"EXCEPTION {type(e).__name__}: {e}"]
        dt = time.time() - t0
        if problems:
            failures += 1
            print(f"FAIL {name} ({dt:.1f}s)", flush=True)
            for p in problems:
                print(f"     {p}", flush=True)
        else:
            print(f"ok   {name} ({dt:.1f}s)", flush=True)
    print(f"== {len(names) - failures}/{len(names)} pass in {time.time()-t_all:.0f}s")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
