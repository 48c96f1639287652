"""Plain-text (delimited lines) source/sink.

The simplest interchange format still in live use for corpus
pipelines: one record per line, fields joined by a separator. Spark's
``text`` reader/writer moves a single string column; typing is this
module's job. Nulls survive the trip through an explicit ``\\N``
sentinel (concat_ws would silently DROP null fields and misalign the
row — the classic flat-file corruption bug this encoding avoids).

Unsuitable payloads (embedded separators/newlines) are the caller's
contract, as with every line-oriented format; the documents table is
newline/tab-free by construction (FIXTURES.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_NULL = "\\N"


def sink_text(df: DataFrame, path: str, sep: str = "\t") -> None:
    """Write a DataFrame as separator-joined text lines (overwrite)."""
    line = F.concat_ws(
        sep,
        *[
            F.coalesce(F.col(c).cast("string"), F.lit(_NULL))
            for c in df.columns
        ],
    )
    df.select(line.alias("value")).write.mode("overwrite").text(path)


def scan_text(spark: SparkSession, path: str, schema: StructType, sep: str = "\t") -> DataFrame:
    """Read separator-joined text lines back into a typed frame.

    One narrow scan; the split + casts are codegen'd expressions, so
    typing happens JVM-side at full scan parallelism.

    ``sep`` is treated as a LITERAL separator: F.split takes a Java
    regex, so the separator is \\Q...\\E-quoted before splitting — a
    caller using ``|`` or ``.`` gets field-wise splits, not
    char-wise ones (ADVICE r4). Caller contract: a field whose string
    value equals the null sentinel (``\\N``) round-trips to NULL —
    callers with adversarial payloads should pick a sentinel outside
    the value domain (sink_text and scan_text share ``_NULL``).
    """
    raw = spark.read.text(path)
    parts = F.split(F.col("value"), "\\Q" + sep + "\\E")
    return raw.select(
        *[
            F.nullif(parts.getItem(i), F.lit(_NULL))
            .cast(f.dataType)
            .alias(f.name)
            for i, f in enumerate(schema.fields)
        ]
    )
