"""Grouped-map operators: applyInPandas over groupBy.

The Arrow-batched grouped-map path for per-group logic that built-in
aggregates/windows can't express (per-group model fits, custom
normalizations over the whole group). Each group arrives as ONE
pandas DataFrame — so the partition-sizing caveat is sharper than for
mapInPandas: a single group must fit in one executor's memory. Keys
here are low-cardinality-bounded (lang, category), never unbounded
(user id with heavy hitters) without pre-bucketing.

Where a window function CAN express the computation (like this
z-score: mean/std are window aggregates), prefer the window — it
stays JVM-side. grouped_zscore exists precisely to exercise and test
the applyInPandas plumbing against a window-function oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def grouped_zscore(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    id_col: str,
    round_decimals: int = 6,
) -> DataFrame:
    """Per-group z-score of ``value_col`` via applyInPandas.

    Output: group cols + id + value + zscore (0.0 for singleton/
    constant groups, matching the SQL convention of NULL-safe
    divide-by-zero → 0 via COALESCE on the oracle side).
    """
    import pandas as pd  # noqa: F401 — imported for the UDF closure

    out_fields = ", ".join(
        [f"{c} {t}" for c, t in df.select(*group_cols, id_col, value_col).dtypes]
        + ["zscore double"]
    )

    def z(pdf):
        v = pdf[value_col].astype("float64")
        std = v.std(ddof=1)
        if not std or std != std:  # 0 or NaN (singleton group)
            pdf["zscore"] = 0.0
        else:
            pdf["zscore"] = ((v - v.mean()) / std).round(round_decimals)
        return pdf[[*group_cols, id_col, value_col, "zscore"]]

    return (
        df.select(*group_cols, id_col, value_col)
        .groupBy(*group_cols)
        .applyInPandas(z, schema=out_fields)
    )
