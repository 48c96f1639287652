"""Numeric expression helpers.

Floating-point sums are order-dependent, and Spark sums in parallel
(partial aggregates per partition) while single-node engines sum
sequentially — so raw double sums of money columns are not
bit-reproducible across engines or even across partitionings. For
deterministic results (and stable oracle hashes) money aggregates go
through fixed-point: scale to integer units per row (exact), sum as
BIGINT (exact, order-independent), descale once at the end.

At 100 TB this is also the *correct* accounting pattern: int64 holds
~9.2e18 scaled units, far beyond any real revenue sum, with zero
accumulation error.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def fixed_point_sum(col: Column, scale: int = 100) -> Column:
    """Order-independent exact sum of a money-like double column.

    Per-row: round(x * scale) → exact integer (prices are 2-decimal
    values, so x*scale is within 1e-9 of an integer). Sum in int64.
    Result descaled back to double — deterministic regardless of
    partitioning/merge order.
    """
    return (
        F.sum(F.round(col * F.lit(scale), 0).cast("long")).cast("double")
        / F.lit(float(scale))
    )


def fixed_point_sum_sql(expr: str, scale: int = 100) -> str:
    """DuckDB-side rendering of fixed_point_sum for oracle queries."""
    return f"CAST(SUM(CAST(ROUND(({expr}) * {scale}) AS BIGINT)) AS DOUBLE) / {scale}"


def cents_expr(col: Column, scale: int = 100) -> Column:
    """Per-row exact integer scaling of a fixed-decimal double column.

    Window/group sums over these int64 units are order-independent;
    divide once at the end (``units/scale``) to present as double —
    bit-identical across engines, unlike summing raw doubles.
    """
    return F.round(col * F.lit(scale), 0).cast("long")


def round6(col: Column) -> Column:
    """Stabilize a double whose cross-engine drift is << 1e-6 (e.g. an
    AVG: the sum error divided by n). Applied identically on the
    oracle side."""
    return F.round(col, 6)
