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
from pyspark.sql.types import StructType


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


def rowgroups_in_range(
    spark: SparkSession,
    path: str,
    stat_col: str,
    lo,
    hi,
) -> tuple[list[tuple[str, int]], int]:
    """The INTRA-file skipping tier (round 8 — `scan_files_pruned`
    works at file granularity; parquet row-group footer stats are the
    next level down, what Iceberg/Delta readers and parquet-mr's own
    filter2 API consult): scan every part file's FOOTER — metadata
    only, a few KB per file, no data pages touched — and return the
    (file, row_group) pairs whose [min, max] interval for ``stat_col``
    intersects [lo, hi], plus the total row-group count for the
    pruning ratio.

    The footer scan is DISTRIBUTED (mapInPandas over the file list):
    at 100 TB a table has tens of thousands of files and the driver
    should never open them serially — each executor task reads its
    files' footers with pyarrow. Only the (file, rg, keep) verdicts —
    one row per ROW GROUP, metadata scale — return to the driver,
    the same planning-time listing discipline as ``pruned_files``.
    A production deployment materializes these stats once at ingest
    into a catalog table (Iceberg's manifest files); re-reading
    footers per query is the stateless equivalent and costs one
    metadata round per file.

    Pruning stays SOUND, never semantic: a row group is skipped only
    when max < lo or min > hi; groups with missing stats are KEPT.
    Callers must still apply the residual row filter.
    """
    import glob
    import os

    files = sorted(
        f
        for f in glob.glob(os.path.join(path, "*.parquet"))
        if os.path.isfile(f)
    )
    if not files:
        raise ValueError(f"rowgroups_in_range: no parquet files under {path}")
    fdf = spark.createDataFrame(
        [(f,) for f in files], "file string"
    ).repartition(min(len(files), 32))

    def scan_footers(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            out: dict[str, list] = {"file": [], "rg": [], "keep": []}
            for fname in pdf["file"]:
                md = pq.ParquetFile(fname).metadata
                # next() with a default: a bare next() exhausting the
                # generator would surface as an opaque PEP 479
                # "generator raised StopIteration" RuntimeError inside
                # the executor (ADVICE r8) — name the column and file.
                ci = next(
                    (
                        i
                        for i in range(md.num_columns)
                        if md.schema.column(i).name == stat_col
                    ),
                    None,
                )
                if ci is None:
                    raise ValueError(
                        f"rowgroups_in_range: stats column {stat_col!r} "
                        f"absent from parquet schema of {fname}"
                    )
                for g in range(md.num_row_groups):
                    st = md.row_group(g).column(ci).statistics
                    if st is None or st.min is None or st.max is None:
                        keep = True  # no stats → must read (sound)
                    else:
                        keep = st.max >= lo and st.min <= hi
                    out["file"].append(fname)
                    out["rg"].append(g)
                    out["keep"].append(keep)
            yield pd.DataFrame(out)

    verdicts = fdf.mapInPandas(
        scan_footers, schema="file string, rg int, keep boolean"
    ).collect()
    survivors = sorted((r["file"], r["rg"]) for r in verdicts if r["keep"])
    return survivors, len(verdicts)


def read_rowgroups(
    spark: SparkSession,
    groups: list[tuple[str, int]],
    columns: list[str],
    schema: StructType,
) -> DataFrame:
    """Row-group-addressed distributed parquet reader: each executor
    task opens its (file, row_group) assignments with pyarrow and
    reads ONLY those groups' pages for ``columns`` — the read path a
    skipping index needs but Spark's public reader cannot address
    (``spark.read.parquet`` takes whole files). Arrow-batched
    (mapInPandas), column-pruned at the pyarrow call, one task per
    ~few row groups — the same work distribution Spark's own scan
    would produce for the surviving byte ranges.

    ``schema`` is the Spark schema of ``columns`` (planning-time,
    from any whole-file reader over the same layout)."""
    if not groups:
        return spark.createDataFrame([], schema)
    gdf = spark.createDataFrame(
        [(f, g) for f, g in groups], "file string, rg int"
    ).repartition(min(len(groups), 32))

    def read_groups(batches):
        import pyarrow.parquet as pq

        for pdf in batches:
            for fname, rg in zip(pdf["file"], pdf["rg"]):
                tbl = pq.ParquetFile(fname).read_row_group(
                    int(rg), columns=columns
                )
                yield tbl.to_pandas()

    return gdf.mapInPandas(read_groups, schema=schema)
