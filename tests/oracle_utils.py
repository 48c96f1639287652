"""Replica of the driver's DuckDB-oracle comparison so every oracle
query is verified locally before the driver ever runs it.

Compare = row count + sorted column names + order-insensitive cell
values (rows sorted after normalization). Floats are compared EXACTLY
— the engine's fp discipline (fixed-point sums, round-before-rank) is
supposed to make Spark and DuckDB bit-agree; any drift is a bug here.
"""

from __future__ import annotations

import datetime
import math

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(x) -> str:
    if x is None:
        return "∅"
    if isinstance(x, float):
        if math.isnan(x):
            return "∅"
        if x == int(x) and abs(x) < 1e15:
            return f"f:{int(x)}"
        return f"f:{x!r}"
    if isinstance(x, (pd.Timestamp, datetime.datetime, datetime.date)):
        ts = pd.Timestamp(x)
        return f"t:{ts.isoformat()}"
    if isinstance(x, (int,)):
        return f"i:{x}"
    return f"s:{x}"


def normalize(df: pd.DataFrame) -> tuple[list[str], list[tuple[str, ...]]]:
    cols = sorted(df.columns)
    rows = [
        tuple(_norm_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    rows.sort()
    return cols, rows


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str):
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} (spark) != {len(oracle_pdf)} (oracle)"
    )
    s_cols, s_rows = normalize(spark_pdf)
    o_cols, o_rows = normalize(oracle_pdf)
    assert s_cols == o_cols, f"{name}: columns {s_cols} != {o_cols}"
    if s_rows != o_rows:
        diffs = [
            (i, a, b) for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")
