"""Every oracle-checked query must hash-match its DuckDB oracle at the
driver's correctness scale factor (sf0.01) — this test IS the local
replica of the driver's t2 gate."""

from __future__ import annotations

import pytest

from bigdatafinalproject_hockey_spark.queries import ORACLE_SQL, QUERIES
from tests.oracle_utils import compare_frames, duckdb_conn

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb_conn(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_oracle_parity(spark, oracle_con, name):
    spark_df = QUERIES[name](spark, SF_DIR)
    spark_pdf = spark_df.toPandas()
    oracle_pdf = oracle_con.execute(ORACLE_SQL[name]).df()
    compare_frames(spark_pdf, oracle_pdf, name)


def test_all_queries_run(spark):
    """Rows-only queries (no oracle) must at least execute and return
    a stable schema at smoke scale."""
    for name, fn in QUERIES.items():
        if name in ORACLE_SQL:
            continue
        df = fn(spark, "/root/testdata/sf0.001")
        assert df.columns, name
        df.limit(5).collect()
