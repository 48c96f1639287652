"""Driver-environment pre-flight: replicate the EXTERNAL gate exactly.

The driver imports `__spark_entry__` with a PLAIN SparkSession (no
custom confs — Spark 4 defaults: ANSI on, AQE on, 200 shuffle
partitions, machine-local session TZ) and compares every `queries()`
entry against its `oracle_sql()` on DuckDB at sf0.01. The pytest
parity suite runs the same compare under the engine's TUNED session
(bigdatafinalproject_hockey_spark.session.get_session), so the plain
session is the one axis pytest does not cover — this script closes it.

Run from the repo root (a fresh process, like the driver):

    python scripts/driver_preflight.py [N]

With N, only the first N registry entries (the driver's rotation
window is 50); without, the whole registry. Exit code 0 iff every
oracle-backed query passes rows+schema+value-hash and no query
raises. Round-5 full-registry result: 180 oracle-OK, 7 rows-only,
0 failures.
"""

from __future__ import annotations

import os
import sys
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

SF = "/root/testdata/sf0.01"


def main() -> int:
    from pyspark.sql import SparkSession

    # PLAIN session, exactly as the driver builds it.
    spark = SparkSession.builder.master("local[16]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod
    from oracle_utils import duckdb_conn, normalize

    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()
    con = duckdb_conn(SF)
    # Streaming availability audit (round 13, VERDICT r12 item 8):
    # record WHY the TWS operator is (or is not) a registered row in
    # this environment, so the artifact shows the gate's verdict.
    from bigdatafinalproject_hockey_spark.streaming import tws_available

    tws_ok, tws_reason = tws_available()
    print(f"[streaming-tws] available={tws_ok}: {tws_reason}")
    print(
        f"[streaming-tws] stream_stateful_totals_tws registered: "
        f"{'stream_stateful_totals_tws' in qs}"
    )
    window = list(qs)[: int(sys.argv[1])] if len(sys.argv) > 1 else list(qs)

    n_ok = n_rows_only = 0
    fails: list[str] = []
    for name in window:
        try:
            sp = qs[name](spark, SF).toPandas()
            if name not in osql:
                n_rows_only += 1
                print(f"{name}: rows-only {len(sp)}")
                continue
            od = con.execute(osql[name]).df()
            c1, r1 = normalize(sp)
            c2, r2 = normalize(od)
            if c1 == c2 and r1 == r2:
                n_ok += 1
                print(f"{name}: OK ({len(sp)}/{len(od)})")
            else:
                fails.append(name)
                why = "schema" if c1 != c2 else "values"
                print(f"{name}: MISMATCH ({why}; {len(sp)}/{len(od)})")
        except Exception as exc:  # noqa: BLE001
            fails.append(name)
            print(f"{name}: ERROR {type(exc).__name__}: {exc}")
            traceback.print_exc(limit=2)
    print(f"\n{n_ok} oracle-OK, {n_rows_only} rows-only, {len(fails)} failed")
    if fails:
        print("FAILS:", fails)
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
