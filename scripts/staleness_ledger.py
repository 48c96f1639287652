"""Computed staleness ledger for the driver-verification rotation.

VERDICT r6 item 2: the round-7 rotation comment in
``queries/__init__.py`` drifted 34 rows from the artifacts because the
ledger was hand-maintained. This module derives, from the
``CORRECTNESS_r*.json`` artifacts themselves, the newest driver round
per *current-registry* query, and from that the canonical stalest-first
verification window. ``queries/__init__.py`` stages ``_VERIFY_FIRST``
from this computation and ``tests/test_registry.py`` asserts the staged
list equals the computed window — the comment can no longer drift.

Canonical window order (50 slots, the observed driver window size):

1. Queries with NO driver row in any round (newcomers registered after
   the last window froze), alphabetically — name order is the only
   deterministic tiebreak available for rows with no artifact.
2. Everything else stalest-first: ascending by newest driver round,
   ties broken by position in that round's artifact (its original
   verification order), truncated to fill the window.

``staged_at_round`` bounds which artifacts count: a window staged for
round N is computed from rounds < N, so the test stays green after the
round-N artifact lands (that artifact verifies this very window and
would otherwise invert the ledger mid-round).

Run as a script to print the ledger and the next window:

    python scripts/staleness_ledger.py [--round N] [--window 50]
"""

from __future__ import annotations

import json
import re
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
WINDOW_SIZE = 50


def artifact_rounds(repo_root: Path = REPO_ROOT) -> dict[int, list[str]]:
    """Round -> query names in that artifact's verification order."""
    rounds: dict[int, list[str]] = {}
    for path in sorted(repo_root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", path.name)
        if not m:
            continue
        rounds[int(m.group(1))] = list(json.loads(path.read_text()))
    return rounds


def newest_driver_round(
    registry_names: list[str],
    staged_at_round: int | None = None,
    repo_root: Path = REPO_ROOT,
) -> dict[str, tuple[int, int] | None]:
    """Name -> (newest round, position in that round's artifact), or None.

    Only artifacts from rounds < ``staged_at_round`` count (see module
    docstring); legacy artifact names no longer in the registry are
    ignored.
    """
    ledger: dict[str, tuple[int, int] | None] = {n: None for n in registry_names}
    for rnd, names in sorted(artifact_rounds(repo_root).items()):
        if staged_at_round is not None and rnd >= staged_at_round:
            continue
        for pos, name in enumerate(names):
            if name in ledger:
                ledger[name] = (rnd, pos)
    return ledger


def compute_window(
    registry_names: list[str],
    staged_at_round: int | None = None,
    window_size: int = WINDOW_SIZE,
    repo_root: Path = REPO_ROOT,
    rows_only: frozenset[str] | set[str] = frozenset(),
    max_rows_only: int | None = None,
    lead: tuple[str, ...] = (),
) -> list[str]:
    """The canonical stalest-first window of ``window_size`` names.

    ``rows_only`` + ``max_rows_only`` (VERDICT r9 item 5): entries
    without an oracle can never upgrade beyond the driver's weaker
    rows-only check, so re-staging them burns hash-verification
    slots — round 9 spent 4 of 50 slots on checks that can never
    hash-verify. With a cap, at most ``max_rows_only`` of the
    ``rows_only`` names (the stalest, in normal ledger order) occupy
    window slots per round; the rest keep aging and take their one
    slot in later rounds. Oracle-backed entries are never deferred.

    ``lead`` (round 13, VERDICT r12 item 2): names whose SEMANTICS
    changed since their newest driver row — their staleness rank
    lies about them (the artifact verified the OLD semantics), so
    they are forced to the window's front in the given order, ahead
    of even the never-verified newcomers; the rest of the window
    fills stalest-first as usual. The list is declared per round in
    ``queries/__init__.py`` (it encodes what changed this round,
    which no artifact can know) and tests assert the staged window
    equals this computation with that list.
    """
    ledger = newest_driver_round(registry_names, staged_at_round, repo_root)
    lead_names = [n for n in lead if n in registry_names]
    never = sorted(
        n for n, v in ledger.items() if v is None and n not in lead_names
    )
    seen = sorted(
        ((v[0], v[1], n) for n, v in ledger.items() if v is not None),
    )
    ordered = lead_names + never + [
        n for _, _, n in seen if n not in lead_names
    ]
    if max_rows_only is None:
        return ordered[:window_size]
    window: list[str] = []
    rows_only_taken = 0
    for name in ordered:
        if len(window) >= window_size:
            break
        if name in rows_only:
            if rows_only_taken >= max_rows_only:
                continue
            rows_only_taken += 1
        window.append(name)
    return window


def main() -> int:
    import argparse
    import sys

    sys.path.insert(0, str(REPO_ROOT))

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--round", type=int, default=None,
                        help="round the window is staged for (bounds artifacts)")
    parser.add_argument("--window", type=int, default=WINDOW_SIZE)
    args = parser.parse_args()

    from bigdatafinalproject_hockey_spark.queries import ORACLE_SQL, QUERIES

    names = list(QUERIES)
    rows_only = set(QUERIES) - set(ORACLE_SQL)
    ledger = newest_driver_round(names, args.round)
    by_round: dict[object, list[str]] = {}
    for name, v in ledger.items():
        by_round.setdefault(v[0] if v else None, []).append(name)
    for rnd in sorted(by_round, key=lambda r: (-1 if r is None else r)):
        label = "never" if rnd is None else f"r{rnd:02d}"
        print(f"{label}: {len(by_round[rnd])} queries")
    window = compute_window(
        names, args.round, args.window, rows_only=rows_only, max_rows_only=1
    )
    print(f"\n# stalest-first window ({len(window)} slots):")
    for name in window:
        v = ledger[name]
        print(f'    "{name}",  # {"never verified" if v is None else f"newest r{v[0]:02d}"}')
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
