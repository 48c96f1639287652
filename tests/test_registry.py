"""Locks on the driver-contract registry ordering.

The driver's per-round CORRECTNESS check covers the first ~50 registry
entries (exactly 50 in rounds 1-4). These tests pin the round-5
rotation contract (VERDICT r4 items 1 and 5): the 42 oracle-backed
round-4c-f queries that were registered after the round-4 window froze
and have never received a driver row lead the window in registration
order; the 7 oldest still-standing round-2 greens take the spare
slots; and the one rows-only newcomer (`text_quality_classifier_fast`,
no oracle BY DESIGN — semantics pinned by its oracle-green portable
twin) sits at the window TAIL where err=no_oracle + a row count is the
wanted driver-smoke evidence.
"""

from bigdatafinalproject_hockey_spark.queries import ORACLE_SQL, QUERIES
from bigdatafinalproject_hockey_spark.queries.__init__ import _VERIFY_FIRST

# Queries whose green rows from earlier rounds are still valid against
# the CURRENT testdata: every CORRECTNESS_r04 green (1 round old) and
# every r3 green not re-verified since (2 rounds old — at the freshness
# limit but valid). These must NOT occupy round-5 window slots.
STILL_GREEN = {
    # r1 singles replaced by composites (their green stands; the
    # composites re-verified green in r3)
    "rename_col", "cast_types", "parse_date", "filter_range",
    "filter_eq", "filter_notnull", "drop_nulls_any", "filter_compound",
    "project_alias", "derive_arith", "case_when", "fill_default",
    "str_normalize_ws", "str_strip_charset",
    # r3 greens (CORRECTNESS_r03 rows not re-run in r4 — 2 rounds old)
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
    # r4 greens (all 46 green CORRECTNESS_r04 rows — 1 round old)
    "ml_eval_deterministic", "agg_approx", "sink_console",
    "text_quality_classifier", "corpus_snapshot_diff",
    "stream_dedup_within_watermark", "join_bloom_pruned",
    "mv_incremental_agg", "scan_schema_evolution", "merge_scd2",
    "join_scd2_pointintime", "ml_eval_calibration", "embedding_quantize",
    "sort_zorder", "scan_files_pruned", "events_retention_cohort",
    "pipeline_incremental_curation", "analytics_shipping_priority",
    "analytics_large_orders", "stream_scd2_cdc", "ts_gapfill",
    "dq_expectations", "graph_pagerank", "join_null_safe",
    "scan_csv_quarantine", "sim_hybrid_rrf", "events_markov_transitions",
    "multimodal_phash_dedup", "ml_eval_kfold", "win_rolling_median",
    "stream_late_data_accounting", "analytics_rfm_segments",
    "analytics_basket_lift", "agg_count_filter", "agg_global_max",
    "agg_group_multi", "anti_join", "join_equi_3key", "join_self_matchup",
    "join_star", "lookup_with_fallback", "map_literal_lookup",
    "semi_join_isin", "str_fuzzy_match", "split_temporal", "dedup_exact",
    # r4 driver smokes (rows-only by nature; smoked is their terminal
    # evidence state — re-smoking buys nothing)
    "ml_train_eval_rf", "ml_train_eval_gbt", "ml_train_eval_mlp",
    "split_random",
}

# The deliberate rows-only tail (round 5): the xxhash64 fast path.
SMOKE_TAIL = ["text_quality_classifier_fast"]

# The 42 never-driver-verified oracle-backed r4c-f queries
# (VERDICT r4 item 1's debt list), in registration order.
NEVER_VERIFIED = [
    # r4c
    "events_attribution", "ts_downsample", "agg_histogram",
    "analytics_promo_share", "events_anomaly_mad",
    "stream_stream_left_outer", "join_dpp", "join_interval_binned",
    "agg_sketch_rollup", "ml_eval_pr_curve",
    # r4d
    "graph_triangle_count", "graph_bfs_hops", "analytics_top_supplier",
    "analytics_idle_customers", "analytics_parts_supplier",
    "stream_chained_agg", "sample_weighted", "ts_ewma",
    "dedup_containment", "scan_text_roundtrip", "events_top_paths",
    "mv_incremental_join",
    # r4e
    "scan_binary_files", "ts_trend_slope", "events_peak_concurrency",
    "agg_listagg", "events_activity_streaks",
    "analytics_small_qty_revenue", "diag_join_key_skew",
    "scan_custom_datasource", "agg_multi_distinct",
    "stream_custom_datasource", "join_asof_nearest",
    # r4f
    "join_lateral_topn", "analytics_ab_test", "analytics_pareto",
    "text_bigrams_udtf", "ts_holt_forecast", "stream_fanout_multi_sink",
    "agg_bitmap_distinct", "events_dau_wau_mau",
    "stream_session_dynamic_gap",
]

# The 7 oldest round-2 greens (two-round-old at r4; VERDICT r4 item 5).
R2_OLDEST = [
    "multimodal_meta", "multimodal_frame_sample", "multimodal_resize",
    "pipeline_features", "join_range", "agg_rollup", "agg_cube",
]


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


def test_never_verified_queries_lead_the_window():
    """VERDICT r4 item 1: every oracle-backed query that has never had
    a driver row must lead the window, in registration order."""
    assert _VERIFY_FIRST[: len(NEVER_VERIFIED)] == NEVER_VERIFIED


def test_r2_oldest_tier_fills_spare_slots():
    """VERDICT r4 item 5: the spare slots go to the oldest r2 greens."""
    assert _VERIFY_FIRST[len(NEVER_VERIFIED):-len(SMOKE_TAIL)] == R2_OLDEST


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
