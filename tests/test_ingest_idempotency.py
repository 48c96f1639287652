"""Regression locks on the idempotent-ingest machinery (VERDICT r4
item 4b/4c): the bucketed-ingest source token must cover the bucket
SPEC (not just the source files), and the testdata contract guard must
catch schema drift in ANY part file with exact integer widths.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bigdatafinalproject_hockey_spark.catalog import load_table, verify_contract
from bigdatafinalproject_hockey_spark.operators.bucketing import write_bucketed

SF_DIR = "/root/testdata/sf0.001"


def _bucket_files(path: str) -> set[str]:
    return {f for f in os.listdir(path) if f.endswith(".parquet")}


def test_changed_bucket_spec_reingests(spark, tmp_path):
    """Same source token + changed bucket count/columns must REWRITE,
    not re-serve the old layout under new DDL (ADVICE r3 item 2 /
    VERDICT r4 item 4b)."""
    df = load_table(spark, "orders", SF_DIR).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    path = str(tmp_path / "orders_bucketed")
    token = "src-size-mtime-fingerprint"

    write_bucketed(df, "t_reingest", ["o_custkey"], 4, path=path, source_token=token)
    first = _bucket_files(path)
    assert len(first) == 4

    # Unchanged spec: the data write is skipped (same files, same mtimes).
    mtimes = {f: os.path.getmtime(os.path.join(path, f)) for f in first}
    write_bucketed(df, "t_reingest", ["o_custkey"], 4, path=path, source_token=token)
    assert _bucket_files(path) == first
    assert all(
        os.path.getmtime(os.path.join(path, f)) == mtimes[f] for f in first
    )

    # Changed bucket COUNT, same source token: must rewrite to 8 buckets.
    write_bucketed(df, "t_reingest", ["o_custkey"], 8, path=path, source_token=token)
    assert len(_bucket_files(path)) == 8
    assert spark.table("t_reingest").count() == df.count()

    # Changed bucket COLUMNS, same token + count: must rewrite again.
    second = _bucket_files(path)
    write_bucketed(df, "t_reingest", ["o_orderkey"], 8, path=path, source_token=token)
    assert _bucket_files(path) != second
    spark.sql("DROP TABLE IF EXISTS t_reingest")


def test_changed_projection_reingests(spark, tmp_path):
    """Same token, different projected schema: the recorded token folds
    in schema.simpleString(), so the narrower table must be rewritten."""
    orders = load_table(spark, "orders", SF_DIR)
    path = str(tmp_path / "orders_proj")
    token = "tok"
    write_bucketed(
        orders.select("o_orderkey", "o_custkey", "o_totalprice"),
        "t_proj", ["o_custkey"], 2, path=path, source_token=token,
    )
    write_bucketed(
        orders.select("o_orderkey", "o_custkey"),
        "t_proj", ["o_custkey"], 2, path=path, source_token=token,
    )
    assert spark.table("t_proj").columns == ["o_orderkey", "o_custkey"]
    spark.sql("DROP TABLE IF EXISTS t_proj")


def test_contract_catches_drift_in_later_part(tmp_path):
    """verify_contract must inspect EVERY part footer: a table whose
    first part is clean but whose second part drifted (int32 where the
    contract says int64) must fail loudly (ADVICE r3 item 3 /
    VERDICT r4 item 4c)."""
    path = str(tmp_path / "region.parquet")
    os.makedirs(path)
    good = pa.table(
        {
            "r_regionkey": pa.array([1], type=pa.int32()),
            "r_name": pa.array(["AMERICA"], type=pa.string()),
        }
    )
    drifted = pa.table(
        {
            "r_regionkey": pa.array([2], type=pa.int64()),  # int32 expected
            "r_name": pa.array(["ASIA"], type=pa.string()),
        }
    )
    # part order is lexicographic — the clean part sorts FIRST, so a
    # first-part-only check would pass this fixture
    pq.write_table(good, os.path.join(path, "part-000.parquet"))
    pq.write_table(drifted, os.path.join(path, "part-001.parquet"))
    with pytest.raises(ValueError, match="r_regionkey"):
        verify_contract("region", path)
    # and the clean-only directory passes
    os.remove(os.path.join(path, "part-001.parquet"))
    verify_contract("region", path)


def test_contract_rejects_loose_integer_width(tmp_path):
    """IntegerType means int32 exactly — an int64 column that merely
    'fits' the integer family must not pass."""
    path = str(tmp_path / "nation.parquet")
    os.makedirs(path)
    t = pa.table(
        {
            "n_nationkey": pa.array([1], type=pa.int64()),  # int32 expected
            "n_name": pa.array(["FRANCE"], type=pa.string()),
            "n_regionkey": pa.array([1], type=pa.int32()),
        }
    )
    pq.write_table(t, os.path.join(path, "part-000.parquet"))
    with pytest.raises(ValueError, match="n_nationkey"):
        verify_contract("nation", path)
