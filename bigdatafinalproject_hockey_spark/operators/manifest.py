"""File-statistics manifest + manifest-pruned scans.

The planning-time half of data skipping: at ingest, record per-FILE
min/max statistics for the hot filter columns into a manifest table
(what parquet footers, Delta transaction logs, and Iceberg manifest
files all store); at query time, consult the manifest FIRST and hand
Spark only the files whose [min, max] interval intersects the
predicate. Files that provably contain no matching row are never
opened, listed into tasks, or scanned — at 100 TB with date-clustered
ingest (or z-ordered layout, operators/partitioning.zvalue_expr) a
narrow time-range query touches a few files out of tens of thousands.

Driver-side work here is METADATA, deliberately: the manifest has one
row per file (thousands, not billions), and turning it into a read
path list is the same planning-time file listing Spark's own
DataSourceV2 / Delta / Iceberg perform on the driver. No DATA row
ever reaches the driver — the no-collect discipline elsewhere in this
package is about data paths.

Pruning is SOUND, never semantic: a skipped file has
max < lo or min > hi, so the residual filter (still applied — the
manifest only rules files out) returns identical results with or
without pruning. That invariant is what the DuckDB oracle checks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def build_minmax_manifest(
    spark: SparkSession, path: str, stat_cols: list[str]
) -> DataFrame:
    """One aggregate pass over a parquet directory → per-file min/max
    for ``stat_cols``: columns ``file, <c>_min, <c>_max``. Run once at
    ingest (cost: one scan of the new files only, in an incremental
    deployment) and persisted next to the data."""
    aggs = []
    for c in stat_cols:
        aggs.append(F.min(c).alias(f"{c}_min"))
        aggs.append(F.max(c).alias(f"{c}_max"))
    return (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("file"))
        .agg(*aggs)
    )


def pruned_files(manifest: DataFrame, keep: Column) -> list[str]:
    """Evaluate a manifest predicate and return the surviving file
    paths. Metadata-scale driver collect: one row per FILE."""
    return [r["file"] for r in manifest.filter(keep).select("file").collect()]


def scan_pruned(
    spark: SparkSession,
    manifest: DataFrame,
    col: str,
    lo,
    hi,
) -> tuple[DataFrame, int]:
    """Manifest-pruned scan for ``lo <= col <= hi``: keep files whose
    [min, max] interval intersects the range, read ONLY those, and
    return (frame, n_files_read). Callers must still apply the
    residual row filter — file granularity is coarser than row
    granularity."""
    keep = (F.col(f"{col}_max") >= lo) & (F.col(f"{col}_min") <= hi)
    files = pruned_files(manifest, keep)
    if not files:
        # Synthesize the empty frame from ONE file's schema — planning
        # a reader over every manifest file here would redo the exact
        # listing work the pruning just skipped (and crash on an empty
        # manifest, which instead errors explicitly).
        any_file = [r["file"] for r in manifest.select("file").limit(1).collect()]
        if not any_file:
            raise ValueError("scan_pruned: empty manifest — no schema source")
        empty = spark.read.parquet(any_file[0]).limit(0)
        return empty, 0
    return spark.read.parquet(*files), len(files)
