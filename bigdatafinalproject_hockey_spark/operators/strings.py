"""String normalization operators (SURVEY.md §2.3).

The reference normalizes raw team names before map lookup:
whitespace-collapse + trim, and an uppercase/strip-charset fallback
(reference code/experiment.py:305-316, 344-356).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalize_ws_expr(col: Column | str) -> Column:
    """trim + collapse internal whitespace to single spaces
    (reference code/experiment.py:305-307)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def strip_charset_expr(col: Column | str, keep: str = "A-Z") -> Column:
    """Uppercase then strip everything outside ``keep`` — the
    reference's fallback team-code rule (code/experiment.py:311-316)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.upper(c), f"[^{keep}]", "")


def str_normalize_ws(df: DataFrame, col: str, out: str | None = None) -> DataFrame:
    return df.withColumn(out or col, normalize_ws_expr(col))


def str_strip_charset(df: DataFrame, col: str, out: str | None = None) -> DataFrame:
    return df.withColumn(out or col, strip_charset_expr(col))
