"""Vector expressions over ``array<float>`` embedding columns.

Dot product / norm / cosine as higher-order Catalyst expressions
(zip_with + aggregate) — JVM-side, sequential reduce in element
order, so results are bit-deterministic for a given pair of vectors.
No Python UDF: at 100 TB a row-at-a-time UDF on 64-d vectors is the
difference between scan-speed and 10× slower.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot_expr(a: Column, b: Column) -> Column:
    """Sequential-order dot product of two double arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(dot_expr(a, a))


def cosine_expr(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL-safe on zero vectors (returns NULL)."""
    denom = norm_expr(a) * norm_expr(b)
    return F.when(denom > 0, dot_expr(a, b) / denom)
