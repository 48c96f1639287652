"""Locks on the driver-contract registry ordering.

The driver's per-round CORRECTNESS check covers the first ~50 registry
entries (exactly 50 in rounds 1-5). These tests pin the round-6
rotation contract (VERDICT r5 item 1 — the freshness round): the
queries with zero driver evidence lead (`multimodal_decode_ppm`,
then the round-6 newcomer `multimodal_decode_png`, front-loaded in
the round it landed so it does not inherit decode_ppm's
registered-after-the-window-froze gap); the 34 round-2 greens never
re-verified since round 2 follow in their r2 verification order;
then 14 of the 16 round-3 rows, oldest first (`join_full_outer` and
`stream_foreachbatch_upsert` defer to round 7 — the window is
exactly 50 slots). Every round-6 window entry is oracle-backed: no
rows-only smoke tail this round.
"""

from bigdatafinalproject_hockey_spark.queries import ORACLE_SQL, QUERIES
from bigdatafinalproject_hockey_spark.queries.__init__ import _VERIFY_FIRST

# Queries whose green rows from recent rounds are still valid against
# the CURRENT testdata: every CORRECTNESS_r05 green (1 round old) and
# every r4 green not re-verified since (2 rounds old — at the
# freshness limit but valid). These must NOT occupy round-6 slots.
STILL_GREEN = {
    # r5 window occupants (49/50 green in CORRECTNESS_r05; the 50th,
    # text_quality_classifier_fast, got its wanted rows-only smoke)
    "events_attribution", "ts_downsample", "agg_histogram",
    "analytics_promo_share", "events_anomaly_mad",
    "stream_stream_left_outer", "join_dpp", "join_interval_binned",
    "agg_sketch_rollup", "ml_eval_pr_curve", "graph_triangle_count",
    "graph_bfs_hops", "analytics_top_supplier",
    "analytics_idle_customers", "analytics_parts_supplier",
    "stream_chained_agg", "sample_weighted", "ts_ewma",
    "dedup_containment", "scan_text_roundtrip", "events_top_paths",
    "mv_incremental_join", "scan_binary_files", "ts_trend_slope",
    "events_peak_concurrency", "agg_listagg", "events_activity_streaks",
    "analytics_small_qty_revenue", "diag_join_key_skew",
    "scan_custom_datasource", "agg_multi_distinct",
    "stream_custom_datasource", "join_asof_nearest", "join_lateral_topn",
    "analytics_ab_test", "analytics_pareto", "text_bigrams_udtf",
    "ts_holt_forecast", "stream_fanout_multi_sink", "agg_bitmap_distinct",
    "events_dau_wau_mau", "stream_session_dynamic_gap",
    "multimodal_meta", "multimodal_frame_sample", "multimodal_resize",
    "pipeline_features", "join_range", "agg_rollup", "agg_cube",
    "text_quality_classifier_fast",
    # r4 greens (CORRECTNESS_r04 rows not re-run since — 2 rounds old)
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
    # driver smokes (rows-only by nature; smoked is their terminal
    # evidence state — re-smoking buys nothing)
    "ml_train_eval_rf", "ml_train_eval_gbt", "ml_train_eval_mlp",
    "split_random",
}

# FRONT: the queries with zero driver evidence — the one carried
# into round 6 (registered round 5 after that window froze) plus the
# round-6 newcomer, front-loaded the round it landed.
NEVER_VERIFIED = ["multimodal_decode_ppm", "multimodal_decode_png"]

# The 34 round-2 greens never re-verified since round 2, in their r2
# verification order (VERDICT r5 item 1's staleness list).
R2_STALE = [
    "agg_grouping_sets", "sim_ann_ivf", "stream_stateful_totals",
    "sink_parquet_partitioned", "grouped_zscore", "array_functions",
    "doc_fingerprint", "text_lang_id", "agg_quantile_report",
    "text_bpe_token_count", "sim_knn_classify", "text_token_count",
    "text_repetition_score", "text_top_tokens", "text_quality_score",
    "pipeline_document_curation", "dedup_embedding_cosine",
    "sim_cosine_topk", "dedup_ngram_jaccard", "dedup_components",
    "scan_orc_roundtrip", "agg_corr_stats", "sink_parquet_compacted",
    "pipeline_training_mix", "dedup_segments", "text_bigram_logprob",
    "text_tfidf_top_terms", "topk_global", "union_all",
    "text_contamination", "split_hash", "sample_by_key",
    "text_unigram_logprob", "text_pii_scrub",
]

# 14 of the 16 round-3 rows, oldest first; `join_full_outer` and
# `stream_foreachbatch_upsert` are the r3 rows deferred to round 7
# (the window is exactly 50 slots and the PNG newcomer takes one).
R3_STALE = [
    "map_functions", "json_extract", "sessionize_events",
    "win_first_last", "win_lag", "win_running_sum", "win_range_interval",
    "reshape_unpivot", "sample_stratified", "stream_tumbling_agg",
    "stream_sliding_agg", "stream_dedup", "stream_session_window",
    "stream_static_enrich",
]

# The r3 rows the 50-slot window could not fit — round-7 front-load
# debt (documented in queries/__init__.py's rotation-debt note).
R3_DEFERRED = {"join_full_outer", "stream_foreachbatch_upsert"}


def test_window_is_first_in_registry():
    assert list(QUERIES)[: len(_VERIFY_FIRST)] == _VERIFY_FIRST


def test_window_is_driver_sized():
    assert len(_VERIFY_FIRST) == 50


def test_window_avoids_still_green_queries():
    overlap = set(_VERIFY_FIRST) & STILL_GREEN
    assert not overlap, f"window wastes slots on still-green queries: {overlap}"


def test_window_fully_oracle_backed():
    """No rows-only smoke tail this round: every round-6 window entry
    must carry a DuckDB oracle so all 50 driver rows can hash-match."""
    rows_only = [n for n in _VERIFY_FIRST if n not in ORACLE_SQL]
    assert rows_only == [], f"rows-only queries in window: {rows_only}"


def test_never_verified_queries_lead_the_window():
    """VERDICT r5 item 1: queries with zero driver evidence go
    first — the carried-over decode_ppm, then the round-6 PNG
    newcomer."""
    assert _VERIFY_FIRST[: len(NEVER_VERIFIED)] == NEVER_VERIFIED


def test_r2_stale_tier_follows_in_r2_order():
    n0 = len(NEVER_VERIFIED)
    assert _VERIFY_FIRST[n0 : n0 + len(R2_STALE)] == R2_STALE


def test_r3_stale_tier_fills_remaining_slots():
    assert _VERIFY_FIRST[-len(R3_STALE) :] == R3_STALE


def test_deferred_r3_rows_are_exactly_the_documented_ones():
    """The only r3 rows not in this window must be the documented
    deferrals, not accidental omissions."""
    r3_all = set(R3_STALE) | R3_DEFERRED
    missing = r3_all - set(_VERIFY_FIRST)
    assert missing == R3_DEFERRED, missing


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
