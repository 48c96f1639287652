"""Slowly-changing-dimension (type 2) maintenance.

The warehouse-side sibling of ``dedup_incremental``: a dimension table
whose attribute history must be preserved as versioned rows
(valid_from / valid_to / is_current) while an updates batch merges in.

Scale shape — the whole point of the operator: the merge touches ONLY
the keys present in the updates batch. Unchanged history rows pass
through untouched (in a table-format deployment they are never even
rewritten — copy-on-write of affected files only), no-op updates
(attribute value unchanged) are dropped before they can fabricate a
version, and the only shuffle is one equi-join on the business key
with the (small) updates side broadcastable. Nothing here is
proportional to history length.

No counterpart in the reference (its results table is snapshot-only);
this is extension surface mandated by the training-data-pipeline
north star (dataset/dimension versioning).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _any_tracked_differs(tracked: Sequence[str]) -> Column:
    """NULL-safe 'any tracked attribute changed' predicate between the
    update columns and their ``cur_``-prefixed current-row twins."""
    cond = F.lit(False)
    for c in tracked:
        cond = cond | ~F.col(c).eqNullSafe(F.col(f"cur_{c}"))
    return cond


def merge_scd2(
    current: DataFrame,
    updates: DataFrame,
    key: str,
    tracked: Sequence[str],
    eff_date_col: str = "eff_date",
) -> DataFrame:
    """Merge one updates batch into an SCD2 dimension.

    ``current``: open (is_current) version rows — columns
    ``key, *tracked, valid_from`` (valid_to is implicitly NULL).
    ``updates``: ``key, *tracked, eff_date_col``.

    Returns the merged version table ``key, *tracked, valid_from,
    valid_to, is_current`` where:

    - keys absent from the batch keep their open row unchanged;
    - genuinely changed keys get their open row CLOSED
      (valid_to = eff_date, is_current = 0) plus a new open row
      (valid_from = eff_date);
    - no-op updates (every tracked attribute unchanged, NULL-safely)
      produce NO new version — the classic SCD2 correctness trap;
    - keys new to the dimension insert an open row at eff_date;
    - a batch carrying SEVERAL rows for one key is collapsed to the
      latest row per key (by eff_date, tracked-attribute tie-break)
      before merging — MERGE semantics (Delta/Iceberg MERGE rejects
      duplicate-key batches outright; collapsing is the deterministic
      lenient form). Without the collapse, two same-key rows would
      fan the current row into duplicate closed versions and emit two
      open rows. Intermediate intra-batch states are NOT materialized
      as versions; feed finer-grained batches if every transition
      must appear in history.
    """
    # collapse = max_by over a (eff_date, *tracked) ordering struct —
    # a hash AGGREGATE, not a window, so the operator stays sort-free
    # and its cost stays ∝ batch (plan-locked: no Window node).
    payload = [*tracked, eff_date_col]
    updates = updates.groupBy(key).agg(
        F.max_by(
            F.struct(*[F.col(c) for c in payload]),
            F.struct(F.col(eff_date_col), *[F.col(c) for c in tracked]),
        ).alias("_u")
    ).select(F.col(key), *[F.col(f"_u.{c}").alias(c) for c in payload])
    cur_cmp = current.select(
        F.col(key),
        F.col("valid_from").alias("cur_valid_from"),
        *[F.col(c).alias(f"cur_{c}") for c in tracked],
    )
    j = updates.join(cur_cmp, on=key, how="left")
    # changed = existing key with >=1 tracked attr different; new = no
    # current row at all. Both produce an open row at eff_date.
    changed = j.filter(
        F.col("cur_valid_from").isNotNull() & _any_tracked_differs(tracked)
    )
    new_keys = j.filter(F.col("cur_valid_from").isNull())
    closing = changed.select(F.col(key), F.col(eff_date_col).alias("_close"))
    kept = (
        current.join(closing, on=key, how="left")
        .select(
            F.col(key),
            *tracked,
            F.col("valid_from"),
            F.col("_close").alias("valid_to"),
            F.when(F.col("_close").isNull(), F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("is_current"),
        )
    )
    eff_type = updates.schema[eff_date_col].dataType
    inserted = (
        changed.unionByName(new_keys)
        .select(
            F.col(key),
            *tracked,
            F.col(eff_date_col).alias("valid_from"),
            F.lit(None).cast(eff_type).alias("valid_to"),
            F.lit(1).cast("long").alias("is_current"),
        )
    )
    return kept.unionByName(inserted)


def pointintime_lookup(
    facts: DataFrame,
    history: DataFrame,
    key_left: str,
    key_right: str,
    fact_date_col: str,
) -> DataFrame:
    """Join facts to the dimension version VALID AT the fact's date:
    equi-join on the business key plus the interval predicate
    ``valid_from <= fact_date < valid_to`` (open rows have NULL
    valid_to = unbounded). One key-partitioned shuffle; per-key version
    counts are tiny (one row per attribute change), so the post-join
    interval filter adds no blow-up."""
    cond = (
        (facts[key_left] == history[key_right])
        & (facts[fact_date_col] >= history["valid_from"])
        & (
            history["valid_to"].isNull()
            | (facts[fact_date_col] < history["valid_to"])
        )
    )
    return facts.join(history, cond, "inner")
