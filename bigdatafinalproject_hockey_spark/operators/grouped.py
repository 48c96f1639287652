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
from pyspark.sql import functions as F


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


def pack_sequences(
    df: DataFrame,
    shard_cols: list[str],
    order_col: str,
    tokens_col: str,
    capacity: int,
) -> DataFrame:
    """Greedy sequential packing of documents into fixed token-capacity
    training sequences — the batch-construction step of an LLM data
    pipeline (concatenate docs up to ``capacity`` tokens, start a new
    sequence on overflow).

    Semantics (deterministic, per shard): walk docs in ``order_col``
    order keeping a running fill; a doc joins the current sequence iff
    ``fill + n_tokens <= capacity``, else it opens the next one. A doc
    larger than ``capacity`` occupies a sequence alone (truncation is
    the caller's policy, not this operator's). Output adds ``seq_id``
    (0-based per shard) and ``seq_fill`` (running fill after the doc).

    The fold is inherently sequential WITHIN a shard — no window
    function expresses a capacity-reset running sum — but shards are
    independent, so at 100 TB parallelism comes from sharding (e.g.
    ``doc_id % k`` with k sized so a shard's metadata fits one Arrow
    batch); each group moves only (keys, order, count) columns, never
    text. Implemented as applyInPandas with a numpy loop over the
    token-count vector: per-row Python cost on metadata-width rows
    only.
    """
    import numpy as np

    narrow = df.select(*shard_cols, order_col, tokens_col)
    out_fields = ", ".join(
        [f"{c} {t}" for c, t in narrow.dtypes] + ["seq_id bigint", "seq_fill bigint"]
    )

    def pack(pdf):
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        toks = pdf[tokens_col].to_numpy()
        seq_ids = np.zeros(len(toks), dtype="int64")
        fills = np.zeros(len(toks), dtype="int64")
        fill, sid = 0, 0
        for i, t in enumerate(toks):
            if i > 0 and fill + t > capacity:
                sid += 1
                fill = 0
            fill += int(t)
            seq_ids[i] = sid
            fills[i] = fill
        pdf["seq_id"] = seq_ids
        pdf["seq_fill"] = fills
        return pdf

    return narrow.groupBy(*[F.col(c) for c in shard_cols]).applyInPandas(
        pack, schema=out_fields
    )


def ewma_half(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    value_col: str,
) -> DataFrame:
    """Exponentially weighted moving average with alpha = 1/2 over
    each group's ``order_cols`` sequence: e_1 = x_1,
    e_t = (e_{t-1} + x_t) * 0.5.

    The recursion has no closed window-function form (a
    capacity-style sequential fold, like pack_sequences), so it runs
    as applyInPandas over metadata-width rows. alpha = 1/2 is chosen
    deliberately: halving is EXACT in IEEE 754 (exponent decrement),
    so each step is one correctly-rounded addition followed by an
    exact scale — any engine that performs the same add-then-halve
    sequence produces bit-identical doubles, which lets a recursive
    SQL oracle pin the output value-for-value. (A general alpha
    multiplies twice per step and rounds differently between
    one-multiply and two-multiply formulations — deterministic within
    an engine but not across formulations, so it would need an
    epsilon check instead of a hash pin.)

    Scale shape: groups are independent; each moves only
    (keys, order, value) columns into one Arrow batch. Adds ``ewma``
    (double) to the narrow projection.
    """
    import numpy as np

    narrow = df.select(*group_cols, *order_cols, value_col)
    out_fields = ", ".join(
        [f"{c} {t}" for c, t in narrow.dtypes] + ["ewma double"]
    )

    def fold(pdf):
        pdf = pdf.sort_values(order_cols, kind="mergesort").reset_index(
            drop=True
        )
        x = pdf[value_col].to_numpy(dtype="float64")
        out = np.empty(len(x), dtype="float64")
        e = 0.0
        for i, v in enumerate(x):
            e = v if i == 0 else (e + v) * 0.5
            out[i] = e
        pdf["ewma"] = out
        return pdf

    return narrow.groupBy(*group_cols).applyInPandas(fold, out_fields)


def holt_linear_half(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    value_col: str,
) -> DataFrame:
    """Holt's linear (double-exponential) smoothing with
    alpha = beta = 1/2, reduced per group to its final state:
    l_1 = x_1, b_1 = 0, then
      l_t = (x_t + (l_{t-1} + b_{t-1})) / 2
      b_t = ((l_t - l_{t-1}) + b_{t-1}) / 2
    Output per group: n_points, level, trend, and the one-step
    forecast level + trend.

    Same cross-engine exactness contract as ewma_half: every step is
    a fixed sequence of correctly-rounded IEEE adds/subtracts plus
    exact halvings, so any engine replaying the identical recursion
    (e.g. a recursive SQL CTE) reproduces the doubles bit-for-bit.
    Same scale shape too: one shuffle on the group key, metadata-width
    Arrow batches, sequential only WITHIN a group.
    """
    import numpy as np
    import pandas as pd

    narrow = df.select(*group_cols, *order_cols, value_col)
    key_fields = [
        f"{c} {t}" for c, t in narrow.dtypes if c in group_cols
    ]
    out_fields = ", ".join(
        key_fields
        + ["n_points bigint", "level double", "trend double", "forecast double"]
    )

    def fold(pdf):
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        x = pdf[value_col].to_numpy(dtype="float64")
        lvl, trend = x[0], 0.0
        for v in x[1:]:
            prev = lvl
            lvl = (v + (lvl + trend)) * 0.5
            trend = ((lvl - prev) + trend) * 0.5
        head = pdf.iloc[[0]][[c for c in pdf.columns if c in set(group_cols)]]
        head = head.reset_index(drop=True)
        head["n_points"] = np.int64(len(x))
        head["level"] = lvl
        head["trend"] = trend
        head["forecast"] = lvl + trend
        return head

    return narrow.groupBy(*group_cols).applyInPandas(fold, out_fields)


def holt_linear_half_hof(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    value_col: str,
) -> DataFrame:
    """``holt_linear_half`` as a pure-JVM higher-order-function fold —
    no Python anywhere: collect each group's (order, value) sequence,
    sort_array it (deterministic: order_cols are a unique key), and
    run the two-variable recursion through ``F.aggregate`` with a
    (n, level, trend) struct accumulator. O(n) per group, one shuffle
    total, whole plan stays in Catalyst/codegen.

    This is the production path for FINAL-STATE recursions: aggregate()
    threads one accumulator through the sequence, which is exactly a
    sequential fold, minus the Python-worker spin-up and Arrow
    round-trip of applyInPandas (measured ~5× on the bench suite).
    Per-STEP recursive outputs (ts_ewma) still need the Arrow path —
    Catalyst has fold but no prefix-scan, and growing an array
    accumulator inside aggregate() copies it per element (O(n²)).

    Bit-exactness contract is unchanged from holt_linear_half: the
    step is the same tree of correctly-rounded IEEE adds/subtracts
    and exact halvings; the new-level expression is textually repeated
    inside the trend update exactly as the recursive-CTE oracle
    repeats it, so JVM, numpy, and DuckDB produce identical doubles.

    Memory bound: one group's sequence lives in one row (same bound
    the Arrow path has — a group must fit an executor either way);
    heavy-hitter keys pre-split by time range in both designs.
    """
    seq = F.sort_array(
        F.collect_list(F.struct(*order_cols, F.col(value_col)))
    )

    def step(acc, x):
        v = x[value_col].cast("double")
        lvl = acc["lvl"]
        trend = acc["trend"]
        new_lvl = F.when(acc["n"] == 0, v).otherwise(
            (v + (lvl + trend)) / 2.0
        )
        # the oracle's textually-repeated l_t inside b_t, preserved:
        # b_t = ((l_t - l_{t-1}) + b_{t-1}) / 2
        new_trend = F.when(acc["n"] == 0, F.lit(0.0)).otherwise(
            ((((v + (lvl + trend)) / 2.0) - lvl) + trend) / 2.0
        )
        return F.struct(
            (acc["n"] + F.lit(1).cast("long")).alias("n"),
            new_lvl.alias("lvl"),
            new_trend.alias("trend"),
        )

    init = F.struct(
        F.lit(0).cast("long").alias("n"),
        F.lit(0.0).alias("lvl"),
        F.lit(0.0).alias("trend"),
    )
    state = F.aggregate(F.col("seq"), init, step)
    return (
        df.select(*group_cols, *order_cols, value_col)
        .groupBy(*group_cols)
        .agg(seq.alias("seq"))
        .select(
            *group_cols,
            state["n"].alias("n_points"),
            state["lvl"].alias("level"),
            state["trend"].alias("trend"),
            (state["lvl"] + state["trend"]).alias("forecast"),
        )
    )


def ewma_half_partitioned(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    value_col: str,
) -> DataFrame:
    """``ewma_half`` with the Python overhead amortized per PARTITION
    instead of per group: hash-repartition on the group key, sort
    within partitions on (group, order), then ONE mapInPandas pass
    that folds sequentially and resets the accumulator at group
    boundaries — carrying (last key, last e) across Arrow batches,
    which is sound because batches of one partition arrive in order.

    Same shuffle count as the applyInPandas form (repartition+sort ==
    the groupBy exchange+sort), same numpy add-then-halve operation
    sequence (bit-identical output, locked by an equality test), but
    the per-group pandas frame construction disappears: with many
    tiny groups (the events table: ~10 rows/user) that construction
    IS the cost — measured ~4× on the bench suite. This is the
    per-STEP-output sequential path at scale; final-state recursions
    take the pure-JVM aggregate() fold (holt_linear_half_hof).
    """
    import numpy as np

    narrow = df.select(*group_cols, *order_cols, value_col)
    out_fields = ", ".join(
        [f"{c} {t}" for c, t in narrow.dtypes] + ["ewma double"]
    )
    part = narrow.repartition(*[F.col(c) for c in group_cols]).sortWithinPartitions(
        *group_cols, *order_cols
    )

    def fold(batches):
        last_key = None
        e = 0.0
        for pdf in batches:
            x = pdf[value_col].to_numpy(dtype="float64")
            out = np.empty(len(x), dtype="float64")
            keys = list(zip(*(pdf[c] for c in group_cols)))
            for i in range(len(x)):
                k = keys[i]
                if k != last_key:
                    e = x[i]
                    last_key = k
                else:
                    e = (e + x[i]) * 0.5
                out[i] = e
            pdf = pdf.copy()
            pdf["ewma"] = out
            yield pdf

    return part.mapInPandas(fold, out_fields)
