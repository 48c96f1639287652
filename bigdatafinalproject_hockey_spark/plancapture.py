"""Opt-in capture of INTERMEDIATE physical plans for the plan audit.

The full-registry audit (scripts/plan_audit.py) renders the plan of
the DataFrame each query RETURNS. That render cannot see stages a
query executes eagerly while being BUILT: a ``localCheckpoint``
truncates lineage (the returned plan starts at an RDD scan), and a
per-step parquet write runs a whole job whose plan never reaches the
returned DataFrame at all. A CartesianProduct or shuffle regression
introduced in one of those stages would pass the audit unseen — the
blind spot ADVICE r5 called out on graph_bfs_hops and
mv_incremental_join.

This module closes it with a two-line protocol: iterative / MV /
ingest code paths call ``capture(label, df)`` on each eager stage's
DataFrame BEFORE the checkpoint/write executes it. Outside the audit
the call is a no-op (``_sink is None`` — zero cost in production and
benchmarks); the audit installs a sink that renders and audits every
captured plan under ``<query>#<label>``, giving eager stages the same
cartesian/pruning/shuffle-ratchet coverage as returned plans.

Capture points are code, not config — a new eager stage that skips
``capture()`` is still invisible, so tests/test_plan_audit.py also
asserts the known eager-stage queries produced their expected
captures (a forgotten hook fails the suite, not just the sweep).
"""

from __future__ import annotations

from typing import Callable, Optional

_sink: Optional[Callable] = None


def install(sink: Callable) -> None:
    """Route subsequent capture() calls to ``sink(label, df)``."""
    global _sink
    _sink = sink


def uninstall() -> None:
    global _sink
    _sink = None


def active() -> bool:
    """True iff an audit sink is installed. Lets a capture SITE skip
    CONSTRUCTING an expensive DataFrame it would only build for the
    audit (capture() itself is free, but building a multi-iteration
    plan graph to hand it a no-op is not — ~100 py4j round-trips for
    the Lloyd-fit sidecar on every bench run, round 13)."""
    return _sink is not None


def capture(label: str, df) -> None:
    """Report an eagerly-executed intermediate DataFrame to the
    installed audit sink. No-op (and free) when no sink is installed."""
    if _sink is not None:
        _sink(label, df)
