"""Locks on the driver-contract registry ordering.

The driver's per-round CORRECTNESS check covers the first ~50 registry
entries (exactly 50 in rounds 1-3). These tests pin the round-4
rotation contract: the newly oracle-backed queries lead, then the 11
queries whose only green row is from round 1, then the earliest
round-2 greens (oldest-standing rows first), and — the one deliberate
exception to the no-rows-only rule — the four never-driver-executed
ML/RNG entries at the window TAIL (VERDICT r3 item 4: they can only
earn err=no_oracle + a row count, which is exactly the driver-smoke
evidence wanted, and the tail position displaces the fewest
oracle-backed slots).
"""

from bigdatafinalproject_hockey_spark.queries import ORACLE_SQL, QUERIES
from bigdatafinalproject_hockey_spark.queries.__init__ import _VERIFY_FIRST

# Queries whose green rows from earlier rounds are still valid against
# the CURRENT testdata: every r3 green (CORRECTNESS_r03, earned against
# current encoding), the r2 greens re-earned in r3, and the r1 singles
# replaced by composites. These must NOT occupy window slots.
STILL_GREEN = {
    # r1 singles replaced by composites (their green stands; the
    # composites re-verified green in r3)
    "rename_col", "cast_types", "parse_date", "filter_range",
    "filter_eq", "filter_notnull", "drop_nulls_any", "filter_compound",
    "project_alias", "derive_arith", "case_when", "fill_default",
    "str_normalize_ws", "str_strip_charset",
    # r3 greens (all 48 CORRECTNESS_r03 rows) — freshest possible
    "pack_sequences", "join_bucketed", "cap_per_source", "corpus_drift",
    "chunk_overlap", "dedup_incremental", "scan_chunked", "clean_types",
    "filter_clean", "derive_features", "str_clean", "dedup_simhash",
    "sim_ann_lsh", "sample_stratified", "dedup_minhash_lsh_portable",
    "multimodal_features", "stream_static_enrich", "join_skew_salted",
    "tokenize_to_ids", "dedup_incremental_near", "topk_per_group",
    "json_extract", "events_funnel", "join_asof", "stream_session_window",
    "stream_foreachbatch_upsert", "agg_count_group", "win_row_number",
    "win_expanding_avg", "win_sliding_avg", "win_running_sum", "win_lag",
    "win_first_last", "win_range_interval", "agg_pivot",
    "agg_windowed_distinct", "map_functions", "join_full_outer",
    "sessionize_events", "stream_tumbling_agg", "stream_sliding_agg",
    "stream_dedup", "stream_stream_join", "scan_jsonl_roundtrip",
    "scan_csv_roundtrip", "set_intersect", "set_except",
    "win_rank_family", "reshape_unpivot", "date_functions",
}

# The deliberate rows-only tail (VERDICT r3 item 4).
SMOKE_TAIL = ["ml_train_eval_rf", "ml_train_eval_gbt", "ml_train_eval_mlp",
              "split_random"]


def test_window_is_first_in_registry():
    assert list(QUERIES)[: len(_VERIFY_FIRST)] == _VERIFY_FIRST


def test_window_is_driver_sized():
    assert len(_VERIFY_FIRST) == 50


def test_window_avoids_still_green_queries():
    overlap = set(_VERIFY_FIRST) & STILL_GREEN
    assert not overlap, f"window wastes slots on still-green queries: {overlap}"


def test_window_oracle_backed_except_smoke_tail():
    rows_only = [n for n in _VERIFY_FIRST if n not in ORACLE_SQL]
    assert rows_only == SMOKE_TAIL, (
        f"unexpected rows-only queries in window: {rows_only}"
    )


def test_smoke_tail_is_the_tail():
    assert _VERIFY_FIRST[-len(SMOKE_TAIL):] == SMOKE_TAIL


def test_never_verified_oracle_queries_lead_the_window():
    """Every oracle-backed query that has never had a driver row must
    sit in the window (it can only earn one from there)."""
    never_verified = {
        "ml_eval_deterministic", "agg_approx", "sink_console",
        "text_quality_classifier", "corpus_snapshot_diff",
        "stream_dedup_within_watermark", "join_bloom_pruned",
        "mv_incremental_agg", "scan_schema_evolution",
    }
    missing = never_verified - set(_VERIFY_FIRST[:9])
    assert not missing, missing


def test_r1_only_tier_in_window():
    """VERDICT r3 item 2: the 11 queries green only in round 1 must be
    re-verified this round."""
    r1_only = {
        "agg_count_filter", "agg_global_max", "agg_group_multi",
        "anti_join", "join_equi_3key", "join_self_matchup", "join_star",
        "lookup_with_fallback", "map_literal_lookup", "semi_join_isin",
        "str_fuzzy_match",
    }
    missing = r1_only - set(_VERIFY_FIRST)
    assert not missing, missing


def test_every_oracle_name_is_registered():
    assert set(ORACLE_SQL) <= set(QUERIES)
