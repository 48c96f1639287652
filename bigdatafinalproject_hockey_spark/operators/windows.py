"""Window operators — the signature capability of the reference.

The reference computes leakage-free time-series features per
(team, season) ordered by (date, game): season-to-date expanding
averages with frame ``rowsBetween(unboundedPreceding, -1)`` and
last-5-games sliding averages with frame ``rowsBetween(-5, -1)``
(reference code/experiment.py:416-472). Both frames EXCLUDE the
current row — that's the leakage-free property — and the first row of
each partition gets NULL from the empty frame, later defaulted
(code/experiment.py:476-494).

Scale notes: a window partition must fit one executor's memory.
Reference partitions are (team, season) ≈ 82 rows — trivially
bounded. For unbounded keys (e.g. per-user event history at 100 TB)
prefer win_sliding_* (bounded frame) or pre-aggregate into
fixed-width time buckets before the window.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def ordered_window(
    partition_by: Sequence[str], order_by: Sequence[str]
) -> WindowSpec:
    """Deterministically ordered window.

    The caller must include a unique tiebreaker in ``order_by`` (the
    reference orders by (Date, GameID) where GameID is unique per
    partition, code/experiment.py:418) — otherwise results are
    nondeterministic across runs/partitionings.
    """
    return Window.partitionBy(*partition_by).orderBy(*[F.col(c) for c in order_by])


def win_row_number(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str],
    out: str = "row_num",
) -> DataFrame:
    """Sequence number within partition (reference code/experiment.py:423-429)."""
    w = ordered_window(partition_by, order_by)
    return df.withColumn(out, F.row_number().over(w))


def _framed(agg: Column, w: WindowSpec, start: int, end: int) -> Column:
    return agg.over(w.rowsBetween(start, end))


def win_expanding(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str],
    measures: dict[str, Column],
    include_current: bool = False,
) -> DataFrame:
    """Expanding (season-to-date style) aggregates over all PRIOR rows.

    Frame = ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
    (reference code/experiment.py:416-420, 432-458). First row of each
    partition → NULL (empty frame); pair with scalar.fill_default.
    """
    w = ordered_window(partition_by, order_by)
    end = 0 if include_current else -1
    # "*" keeps every input column without re-resolving names — robust
    # to raw-CSV columns containing dots/spaces (reference results file
    # has "Market_Prob.", "American Odds", FIXTURES.md §A2)
    return df.select(
        "*",
        *[
            _framed(agg, w, Window.unboundedPreceding, end).alias(name)
            for name, agg in measures.items()
        ],
    )


def win_sliding(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str],
    measures: dict[str, Column],
    lookback: int = 5,
    include_current: bool = False,
) -> DataFrame:
    """Sliding last-N-rows aggregates, current row excluded by default.

    Frame = ROWS BETWEEN -N AND -1, exactly as the reference's
    last-5-games form features (code/experiment.py:461-472).
    """
    w = ordered_window(partition_by, order_by)
    end = 0 if include_current else -1
    return df.select(
        "*",
        *[
            _framed(agg, w, -lookback, end).alias(name)
            for name, agg in measures.items()
        ],
    )


def win_running_sum(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str],
    value_col: str,
    out: str = "running_sum",
) -> DataFrame:
    """Inclusive running total (capability extension; frame ends at 0)."""
    w = ordered_window(partition_by, order_by)
    return df.withColumn(
        out, F.sum(value_col).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )


def win_lag(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str],
    value_col: str,
    offset: int = 1,
    out: str = "prev_value",
) -> DataFrame:
    """Previous row's value within partition (extension; NULL on first row)."""
    w = ordered_window(partition_by, order_by)
    return df.withColumn(out, F.lag(value_col, offset).over(w))


def topk_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rnk",
) -> DataFrame:
    """Top-K rows per group via row_number — the distributed form of the
    reference's driver-side top-10 (code/experiment.py:45-52).

    ``order_by`` must break ties deterministically.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
