"""Partition-layout helpers.

A scan of a small file set yields as few partitions as there are
file splits — at local/test scale often ONE. Any CPU-bound stage
downstream (shingling, LSH banding, vector math over every row pair)
then runs on one core while 31 idle. At cluster scale the same
mismatch appears whenever a compact columnar input (one 1 GB parquet
of compressed text) fans out into work that is much more expensive
per row than the scan itself.

``ensure_parallelism`` widens the layout only when it is actually
narrow — it never shrinks, and it no-ops when the scan already
produced enough splits (the common case on a real cluster, where
maxPartitionBytes sizes splits). A round-robin repartition of the
*pre-expansion* rows is cheap (one shuffle of the compact form) and
buys full-core utilization for the expensive stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition up to ``min_partitions`` (default: the
    session's default parallelism) iff the frame currently has fewer
    partitions. Use ahead of CPU-heavy per-row work; never use after a
    keyed shuffle you want to preserve."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def zvalue_expr(x, y, bits: int = 10):
    """Z-order (Morton) interleave of two non-negative integer keys,
    ``bits`` bits each → one long in [0, 2^(2*bits)). Sorting or
    range-partitioning by this value clusters rows that are close in
    BOTH dimensions into the same partition/file, so per-file min/max
    stats stay tight on x AND y and a selective predicate on EITHER
    dimension prunes most files — the multi-dimensional data-skipping
    layout (Delta/Iceberg Z-ORDER BY) that a single-column sort cannot
    provide (it leaves the second dimension's per-file range at full
    width). Pure integer shift/mask arithmetic — portable to any
    engine, no UDF."""
    from pyspark.sql import functions as F

    xc = F.col(x) if isinstance(x, str) else x
    yc = F.col(y) if isinstance(y, str) else y
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z + F.shiftleft(F.shiftright(xc, i).bitwiseAND(1), 2 * i)
        z = z + F.shiftleft(F.shiftright(yc, i).bitwiseAND(1), 2 * i + 1)
    return z


def zvalue_sql(x: str, y: str, bits: int = 10) -> str:
    """DuckDB/ANSI twin of ``zvalue_expr`` (same shift/mask terms)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"
