"""ORC source/sink — the second columnar format after parquet.

Spark ships a vectorized ORC reader with the same scan-level
optimizations as parquet (column pruning via ReadSchema, predicate
pushdown into stripe/row-group skipping), so ORC tables slot into the
engine with no operator changes. Use it when the lakehouse standard is
ORC (Hive-heritage estates); parquet stays the default elsewhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def scan_orc(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Explicit-schema ORC scan. ORC files carry their own schema;
    passing ours pins column order and types (and fails fast on
    drift) instead of trusting whatever was written."""
    return spark.read.schema(schema).orc(path)


def sink_orc(df: DataFrame, path: str) -> None:
    """Columnar ORC sink (snappy by default). Like the parquet sink,
    one file per partition — repartition first to control file count
    and size at scale."""
    df.write.mode("overwrite").orc(path)
