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
