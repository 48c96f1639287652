"""Targeted oracle check: verify a LIST of registry queries against
their DuckDB oracles at a given SF dir, under the driver-shaped plain
session (the driver_preflight protocol, without walking the whole
registry). Round-13 optimization workflow: after touching an
operator, re-prove exactly the affected queries before moving on.

    python scripts/oracle_check.py [--sf DIR] query [query ...]
"""

from __future__ import annotations

import os
import sys
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> int:
    args = sys.argv[1:]
    sf = "/root/testdata/sf0.01"
    if args and args[0] == "--sf":
        sf = args[1]
        args = args[2:]
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[16]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod
    from oracle_utils import duckdb_conn, normalize

    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()
    con = duckdb_conn(sf)
    fails = []
    for name in args:
        try:
            sp = qs[name](spark, sf).toPandas()
            if name not in osql:
                print(f"{name}: rows-only {len(sp)}")
                continue
            od = con.execute(osql[name]).df()
            c1, r1 = normalize(sp)
            c2, r2 = normalize(od)
            if c1 == c2 and r1 == r2:
                print(f"{name}: OK ({len(sp)}/{len(od)})")
            else:
                fails.append(name)
                why = "schema" if c1 != c2 else "values"
                print(f"{name}: MISMATCH ({why}; {len(sp)}/{len(od)})")
        except Exception as exc:  # noqa: BLE001
            fails.append(name)
            print(f"{name}: ERROR {type(exc).__name__}: {exc}")
            traceback.print_exc(limit=3)
    print(f"\n{len(args) - len(fails)} OK, {len(fails)} failed")
    if fails:
        print("FAILS:", fails)
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
