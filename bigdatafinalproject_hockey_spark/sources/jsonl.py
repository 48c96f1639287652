"""JSON-Lines source/sink — the lingua franca of pretraining corpora.

Large text/training datasets ship as newline-delimited JSON (one
document object per line, gzip-friendly, streamable). Spark's json
reader handles the format natively and splits big files by byte range
exactly like CSV.

Scale notes: like CSV, JSONL is a row INGEST format — no column
pruning, no predicate pushdown, and every scan re-parses every byte.
Land it as parquet (``sources.csv.csv_to_parquet`` works on any
DataFrame) before analytics. Always pass an explicit schema: schema
inference on JSON costs a full extra scan AND silently widens types
from whatever it happens to see first (the same trap as CSV
inferSchema, reference code/experiment.py:283).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def scan_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Explicit-schema JSONL scan. Missing keys → NULL; extra keys are
    ignored (schema projection happens at parse time, so unused fields
    are never materialized)."""
    return spark.read.schema(schema).json(path)


def sink_jsonl(df: DataFrame, path: str) -> None:
    """One JSON object per row, newline-delimited. Nulls are omitted
    from the serialized objects (Spark default), which the
    explicit-schema reader maps back to NULL — a lossless round-trip
    for scalar columns."""
    df.write.mode("overwrite").json(path)
