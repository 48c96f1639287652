"""Locks on the driver-contract registry ordering.

The driver's per-round CORRECTNESS check covers the first ~50 registry
entries (exactly 50 in rounds 1-6). Round 6's hand-maintained staging
comment drifted 34 rows from the artifacts (VERDICT r6 item 1), so the
window is now COMPUTED: ``scripts/staleness_ledger.py`` derives each
query's newest driver round from the ``CORRECTNESS_r*.json`` artifacts
and emits the canonical stalest-first window, and this suite fails if
``_VERIFY_FIRST`` is not exactly that computation (VERDICT r6 item 2).
"""

import importlib.util
import os

from bigdatafinalproject_hockey_spark.queries import ORACLE_SQL, QUERIES
from bigdatafinalproject_hockey_spark.queries.__init__ import (
    _STAGED_AT_ROUND,
    _VERIFY_FIRST,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_spec = importlib.util.spec_from_file_location(
    "staleness_ledger", os.path.join(REPO, "scripts", "staleness_ledger.py")
)
ledger = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(ledger)


def test_window_is_first_in_registry():
    assert list(QUERIES)[: len(_VERIFY_FIRST)] == _VERIFY_FIRST


def test_window_is_driver_sized():
    assert len(_VERIFY_FIRST) == 50


def test_verify_first_is_computed_stalest_first():
    """VERDICT r6 item 2: the staged window must equal the ledger
    computed from the CORRECTNESS_r*.json artifacts (rounds <
    _STAGED_AT_ROUND) — never-verified newcomers first
    (alphabetical), then ascending by newest driver round with ties
    in that round's artifact order. Since round 10 (VERDICT r9
    item 5) rows-only entries are capped at ONE window slot. A hand
    edit that skips a stale row or re-verifies a fresh one fails
    here."""
    from bigdatafinalproject_hockey_spark.queries import _RESEMANTICIZED

    computed = ledger.compute_window(
        list(QUERIES),
        _STAGED_AT_ROUND,
        rows_only=set(QUERIES) - set(ORACLE_SQL),
        max_rows_only=1,
        lead=_RESEMANTICIZED,
    )
    assert _VERIFY_FIRST == computed, (
        "staged _VERIFY_FIRST is not the computed stalest-first window; "
        "regenerate with: python scripts/staleness_ledger.py --round "
        f"{_STAGED_AT_ROUND}"
    )


def test_rows_only_cap_defers_all_but_the_stalest():
    """The cap rule itself: an uncapped round-10 window would spend
    three slots on permanently rows-only entries
    (text_quality_classifier_fast r5, plus dedup_minhash_lsh and
    ml_train_eval at r6); the capped window keeps only the stalest
    one and backfills with oracle-backed rows, never dropping an
    oracle-backed entry that the uncapped window held."""
    rows_only = set(QUERIES) - set(ORACLE_SQL)
    # A 100-slot view reaches past the r6 artifact head and picks up
    # several rows-only entries — enough to exercise the cap (the
    # actual 50-slot round-10 window happens to hold just one).
    uncapped = ledger.compute_window(list(QUERIES), _STAGED_AT_ROUND, 100)
    capped = ledger.compute_window(
        list(QUERIES), _STAGED_AT_ROUND, 100,
        rows_only=rows_only, max_rows_only=1,
    )
    assert len(capped) == len(uncapped)
    assert len(set(uncapped) & rows_only) >= 2  # the cap has work to do
    assert len(set(capped) & rows_only) == 1
    dropped = set(uncapped) - set(capped)
    assert dropped <= rows_only, f"oracle-backed rows displaced: {dropped}"
    # order among surviving entries is unchanged — the cap only skips.
    surviving = [n for n in uncapped if n in set(capped)]
    assert capped[: len(surviving)] == surviving
    # and the one surviving rows-only entry is the STALEST such entry.
    assert next(n for n in uncapped if n in rows_only) == next(
        n for n in capped if n in rows_only
    )


def test_ledger_rejects_the_round6_hand_staging():
    """The computed ledger must actually catch the drift class the
    judge found: round 6's hand-staged plan put `ml_eval_deterministic`
    (an r4 row) ahead of the 36 r3-stale rows and omitted
    `ml_train_eval` (r1) and `dedup_minhash_lsh` (r2) entirely. Those
    three orderings are exactly what compute_window corrects.

    Pinned to round 7 (the round the drift was found): at round 7 the
    artifacts visible to the ledger are r1-r6, reproducing the exact
    staleness state the round-6 hand staging mis-ordered. Later rounds
    verify those queries, so the historical regression only exists at
    this bound. Window size = full registry: queries registered after
    round 7 enter as never-verified and would otherwise push the r4
    tail rows out of a 50-slot view — the regression is about ORDER,
    which the full-length window preserves."""
    computed = ledger.compute_window(list(QUERIES), 7, len(QUERIES))
    assert computed.index("ml_train_eval") < computed.index("pack_sequences")
    assert computed.index("dedup_minhash_lsh") < computed.index("pack_sequences")
    r3_rows = [n for n in computed if n == "date_functions" or n == "pack_sequences"]
    assert computed.index("ml_eval_deterministic") > computed.index("date_functions")
    assert r3_rows  # both present


def test_window_staleness_bound_after_landing():
    """Once this window lands (CORRECTNESS_r10), no ORACLE-BACKED
    registry query's newest evidence may be older than r6: every
    oracle-backed row staler than that must be inside the staged
    window (never-verified newcomers included). Rows-only smokes are
    exempt — the round-10 cap (VERDICT r9 item 5) deliberately lets
    them age one round longer per deferral, since their evidence
    class (rows+schema only) barely ages."""
    newest = ledger.newest_driver_round(list(QUERIES), _STAGED_AT_ROUND)
    stale = {n for n, v in newest.items() if v is None or v[0] < 6}
    oracle_backed_out = (stale & set(ORACLE_SQL)) - set(_VERIFY_FIRST)
    never_out = {n for n, v in newest.items() if v is None} - set(_VERIFY_FIRST)
    assert not oracle_backed_out, (
        f"oracle-backed pre-r6 evidence left outside the window: "
        f"{oracle_backed_out}"
    )
    assert not never_out, f"never-verified queries left outside: {never_out}"


def test_window_rows_only_entries_are_the_designed_smokes():
    """Window entries without oracles must be documented rows-only
    smokes that earned a slot by staleness — nothing else may ship
    oracle-less, and since round 10 at most ONE such entry may hold
    a slot (VERDICT r9 item 5). Round 13's slot goes to the stalest
    rows-only entry, ml_train_eval_rf (r9; RandomForest training is
    inherently RNG-dependent — its evaluation math is hash-pinned by
    the ml_eval_* deterministic twins)."""
    rows_only = [n for n in _VERIFY_FIRST if n not in ORACLE_SQL]
    assert rows_only == ["ml_train_eval_rf"], rows_only


def test_every_oracle_name_is_registered():
    assert set(ORACLE_SQL) <= set(QUERIES)


def test_registry_covers_whole_surface():
    """Registry size + oracle coverage lock (new queries must come
    with oracles unless deliberately rows-only)."""
    rows_only = set(QUERIES) - set(ORACLE_SQL)
    assert rows_only == {
        "dedup_minhash_lsh", "split_random", "ml_train_eval",
        "ml_train_eval_rf", "ml_train_eval_gbt", "ml_train_eval_mlp",
        "text_quality_classifier_fast",
    }, rows_only
