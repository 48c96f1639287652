"""Aggregation operators (SURVEY.md §2.5).

The reference's aggregations: a multi-measure groupBy over
(game, season, team) (reference code/experiment.py:359-366), an
ungrouped max (code/experiment.py:564), a groupBy-count confusion
matrix (678-680), and — inefficiently — four separate filter+count
jobs for tp/tn/fp/fn (645-656). This module keeps the first three
shapes and replaces the fourth with a SINGLE-PASS conditional
aggregation (`agg_count_filter`): one shuffle instead of four full
re-scans, which is the difference between one job and four at 100 TB.

Catalyst plans all of these as partial (map-side) + final hash
aggregates, so the shuffle moves only one row per (partition, key).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def agg_group_multi(
    df: DataFrame, keys: Sequence[str], measures: Mapping[str, Column]
) -> DataFrame:
    """groupBy(keys).agg(named measures) — the reference's per-game
    event rollup (4×sum + 2×avg, code/experiment.py:359-366).
    Alias discipline: every measure is named by its dict key so result
    schemas are stable for downstream joins and oracle comparison."""
    return df.groupBy(*keys).agg(
        *[m.alias(name) for name, m in measures.items()]
    )


def agg_global_max(df: DataFrame, col: str, out: str | None = None) -> DataFrame:
    """Ungrouped max (reference code/experiment.py:564). Returns a
    1-row DataFrame; use collect_scalar to pull the value."""
    return df.agg(F.max(col).alias(out or f"max_{col}"))


def collect_scalar(df: DataFrame):
    """Pull a 1-row/1-col aggregate to the driver — the only sanctioned
    collect in the engine (reference code/experiment.py:564)."""
    return df.first()[0]


def agg_count_group(
    df: DataFrame, keys: Sequence[str], out: str = "count", sort: bool = True
) -> DataFrame:
    """groupBy(keys).count().orderBy(keys) — the displayed confusion
    matrix (reference code/experiment.py:678-680)."""
    res = df.groupBy(*keys).agg(F.count(F.lit(1)).alias(out))
    return res.orderBy(*keys) if sort else res


def agg_count_filter(
    df: DataFrame, cells: Mapping[str, Column]
) -> DataFrame:
    """Many filtered counts in ONE pass: count(CASE WHEN pred) per cell.

    Replaces the reference's 4 separate .filter(p).count() jobs for
    tp/tn/fp/fn (code/experiment.py:645-656) with a single job —
    SURVEY.md §3.3 flags the 6-job evaluation as the thing not to
    replicate."""
    return df.agg(
        *[
            F.count(F.when(pred, F.lit(1))).alias(name)
            for name, pred in cells.items()
        ]
    )


def agg_rollup(
    df: DataFrame, keys: Sequence[str], measures: Mapping[str, Column]
) -> DataFrame:
    """Hierarchical subtotals: groupBy().rollup(keys) — (k1,k2), (k1),
    and grand total in ONE pass. Catalyst expands the grouping sets
    map-side, so this still shuffles once (vs one job per level if
    composed by hand). Null key cells mark subtotal rows, as in ANSI
    ROLLUP."""
    return df.rollup(*keys).agg(*[m.alias(n) for n, m in measures.items()])


def agg_cube(
    df: DataFrame, keys: Sequence[str], measures: Mapping[str, Column]
) -> DataFrame:
    """All 2^k grouping-set combinations in one pass (ANSI CUBE)."""
    return df.cube(*keys).agg(*[m.alias(n) for n, m in measures.items()])


def agg_approx(
    df: DataFrame,
    keys: Sequence[str],
    distinct_col: str,
    quantile_col: str,
    quantiles: Sequence[float] = (0.5, 0.95),
    rsd: float = 0.05,
    accuracy: int = 10000,
) -> DataFrame:
    """Sketch-based aggregates — the 100 TB substitutes for exact
    count(DISTINCT) and sorted percentiles:

    - ``approx_count_distinct``: HyperLogLog++, fixed ~kilobytes of
      state per group vs an unbounded distinct hash set; merges
      map-side, so the shuffle carries sketches, not values.
    - ``percentile_approx``: Greenwald-Khanna sketch, bounded error
      ``1/accuracy``, vs a full sort per group.

    Sketch internals are engine-specific → rows-only driver check;
    tests/test_modules.py bounds both errors against the exact answers.
    """
    qarr = F.array(*[F.lit(q) for q in quantiles])
    return df.groupBy(*keys).agg(
        F.approx_count_distinct(distinct_col, rsd=rsd).alias("approx_distinct"),
        F.percentile_approx(quantile_col, qarr, accuracy).alias("approx_quantiles"),
        F.count(F.lit(1)).alias("n_rows"),
    )
