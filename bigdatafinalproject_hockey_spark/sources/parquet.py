"""Parquet sink/scan with the two physical layouts that matter at
100 TB: hive-style partition directories (partition PRUNING — a
filter on the partition key skips whole directories at planning time)
and bucketed tables (co-located joins — two tables bucketed on the
same key by the same bucket count join with ZERO shuffle).

The reference has no parquet sink (it prints to stdout); these are
the sinks its pipeline would need in production.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def sink_parquet(
    df: DataFrame, path: str, partition_by: list[str] | None = None
) -> None:
    """Write parquet, optionally hive-partitioned by low-cardinality
    keys (date/season/year). Verify pruning with .explain() on a
    filtered read-back: PartitionFilters must list the predicate."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def scan_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def sink_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    n_buckets: int,
    sort_by: list[str] | None = None,
) -> None:
    """Persist as a bucketed managed table: rows are hash-distributed
    into ``n_buckets`` files per partition by ``bucket_by``. A join of
    two tables bucketed on the same key with the same bucket count
    needs no exchange on either side — the payoff is a shuffle-free
    big⋈big join, the single biggest cost at 100 TB. Requires a
    catalog (saveAsTable), not a bare path. Thin managed-table wrapper
    over operators.bucketing.write_bucketed (single implementation).
    """
    from bigdatafinalproject_hockey_spark.operators.bucketing import write_bucketed

    write_bucketed(df, table, bucket_by, n_buckets, sort_cols=sort_by)


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> DataFrame:
    """Small-files compaction: rewrite a parquet directory into files
    sized near ``target_file_bytes`` and return the compacted
    read-back.

    Streaming ingest (per-trigger appends) and over-parallel writes
    leave thousands of KB-sized files; every later scan then pays one
    task + one open per file and loses row-group-sized IO. Compaction
    is the standing maintenance job of any lake table. File count is
    chosen from the ACTUAL byte size of the input (Spark's own
    relation sizing), not row counts — compressed bytes are what IO
    cost tracks. repartition (round-robin shuffle) balances output
    sizes regardless of input skew.
    """
    src = spark.read.parquet(src_path)
    total_bytes = src._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    n_files = max(1, int((int(total_bytes) + target_file_bytes - 1) // target_file_bytes))
    src.repartition(n_files).write.mode("overwrite").parquet(dst_path)
    return spark.read.parquet(dst_path)
