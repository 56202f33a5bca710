"""Driver-window invariants for query registration.

The correctness driver records rows for the FIRST 50 registered queries only
(observed in CORRECTNESS_r01: 50 rows of 55, registration order). These tests
pin the contract that keeps every distinct operator family inside the window:
deferred queries register last and each has an in-window sibling covering the
same operator family.
"""

from trading_etl_spark import registry
from trading_etl_spark.registry import build_oracles, build_queries

DRIVER_WINDOW = 50

# deferred key -> the in-window sibling that exercises the same operator
SIBLING = {
    "sma_dead_cross": "sma_golden_cross",
    "spread_quantiles": "orders_table_profile",
    "avg_close_pivot": "candle_rollup",
    "text_fingerprint": "dedup_exact",
    "media_resize": "media_extract_meta",
    "embedding_near_dup": "embedding_near_dup_lsh",
    "dedup_ngram_jaccard": "dedup_minhash_lsh",
    "embedding_knn_bruteforce": "embedding_knn_ivf_kmeans",
    "embedding_knn_ivf": "embedding_knn_ivf_kmeans",
    "embedding_knn_ivf_multiprobe": "embedding_knn_ivf_kmeans",
    "text_simhash": "dedup_minhash_lsh",
    "event_props_json_agg": "events_value_histogram",
    "top_customers_by_open_value": "top_customers_page2_offset",
    "candle_cube": "candle_rollup",
    "backtest_equity_curve": "backtest_pnl",
    "media_frame_sample": "media_extract_meta",
    "sma_fanout_all_tf": "sma_golden_cross",
    "backtest_trades": "backtest_pnl",
    "watermark_max_time": "incremental_cursor_scan",
    "text_token_count": "text_quality_score",
    "text_top_terms_per_lang": "text_tfidf_top_terms",
    # r5 rotation: 14 r1-r4-driver-green queries moved out, each with a
    # same-family twin still in the window.
    "ohlc_derived_multi_tf": "candle_rollup",
    "sma_14_1h": "sma_golden_cross",
    "tick_sessions": "streaming_ohlc_1m",  # session-window rep rotated out r8; streaming window-agg family
    "candle_returns_quartile": "orders_table_profile",
    "event_reaction_window": "event_asof_tick",
    "dedup_simhash": "dedup_minhash_lsh",
    "dedup_connected_components": "dedup_cc_two_phase",
    "dedup_passages": "corpus_pack_sequences",
    "text_repetition_filter": "text_quality_score",
    "train_test_split": "stratified_sample_by_lang",
    "embedding_label_centroids": "embedding_knn_ivf_kmeans",
    "embedding_quantize_int8": "embedding_knn_ivf_kmeans",
    "daily_active_users": "approx_distinct_users",
    "returned_order_priority_semi": "customers_no_open_orders_anti",
    # r6 rotation: 11 r5-driver-green queries moved out so the 9 r5-born +
    # 2 r6-born operators get driver rows; each has a same-family twin
    # still in the window (ema_14_1h's twin runs its EXACT oracle through
    # the stateful-streaming path).
    "candle_gap_fill": "candle_rollup",
    "event_asof_next_tick": "event_asof_tick",
    "text_bigram_pmi": "text_tfidf_top_terms",
    "dim_scd2_history": "user_cohort_retention",
    "user_funnel_conversion": "user_cohort_retention",
    "sample_weighted_quality": "stratified_sample_by_lang",
    "text_chunk_rag": "corpus_pack_sequences",
    "streaming_sliding_stats": "streaming_ohlc_1m",
    "text_pii_redact": "text_quality_score",
    "urgent_not_finished_setops": "customers_no_open_orders_anti",
    "ema_14_1h": "rsi_14_1h",
    # r7 rotation wave 1: 12 r6-driver-green queries moved out so 12 of the
    # 22 r6-born operators get driver rows; each keeps a same-family twin
    # still in the window (ohlc_1m / text_heavy_hitters_cms /
    # decontaminate_train_ngrams twins run their EXACT oracles).
    "ohlc_1m": "streaming_ohlc_1m",
    "event_asof_nearest_tick": "event_asof_tick",
    "embedding_pq_codes": "embedding_knn_ivfadc",
    "embedding_knn_pq_adc": "embedding_knn_ivfadc",
    "decontaminate_train_ngrams": "decontaminate_bloom_prefilter",
    "text_heavy_hitters_cms": "streaming_heavy_hitters",
    "streaming_dedup_exact": "dedup_exact",
    "star_join_revenue": "local_supplier_volume",
    "text_rolling_fingerprint": "corpus_pack_sequences",
    "corpus_clean_pipeline": "dedup_minhash_lsh",
    # r8 rotation wave 2: 13 r7-driver-green queries moved out so the 12
    # prioritized r6/r7-born operators + approx_value_quantiles (the
    # GK-quantile family's representative, VERDICT r7 task #4) get driver
    # rows; each keeps a same-family twin still in the window
    # (dim_scd2_merge_apply's twin runs its EXACT oracle through the
    # stricter stateful-streaming path).
    "macd_12_26_9_1h": "rsi_14_1h",
    "bollinger_20_2_1h": "sma_golden_cross",
    "hybrid_search_rrf": "bm25_search",
    "embedding_knn_matryoshka": "embedding_knn_ivf_kmeans",
    "corpus_dsir_resample": "text_unigram_logprob",
    "dedup_semantic_kmeans": "embedding_knn_ivf_kmeans",
    "dim_scd2_merge_apply": "streaming_scd2_apply",
    "events_snapshot_diff": "streaming_scd2_apply",
    "streaming_tick_sessions": "streaming_ohlc_1m",
    "streaming_sma_cross": "streaming_heavy_hitters",
    "tpch_pricing_summary": "priority_shipmonth_q12",
    "streaming_view_click_join": "streaming_ohlc_1m",
    "text_lang_id": "text_quality_score",
    # wave 3 candidates, still deferred (siblings re-pointed where their
    # previous sibling rotated out this round):
    "streaming_ema_14_1h": "streaming_heavy_hitters",
    "streaming_rsi_14_1h": "streaming_heavy_hitters",
    "events_value_winsorize": "events_value_histogram",
    "shipping_priority_q3": "local_supplier_volume",
    "pair_rolling_correlation": "sma_golden_cross",
    "candle_unpivot": "candle_rollup",
    "event_type_copairs": "events_value_histogram",
    "bpe_encode_fertility": "bpe_train_merges",
    # r8-born, registered deferred until the r9 rotation:
    "events_retention_plan": "ticks_freshness_sla",
    "events_zorder_stats": "events_value_histogram",
    "volatility_20_1h": "sma_golden_cross",
    "returned_item_q10": "priority_shipmonth_q12",
    "dedup_lsh_eval": "dedup_minhash_lsh",
    "event_asof_tick_plain": "event_asof_tick",
    "backtest_max_drawdown": "backtest_pnl",
    "corpus_strip_dup_spans": "dedup_exact_substring",
}


def test_window_holds_every_non_deferred_query():
    keys = list(build_queries())
    in_window = keys[:DRIVER_WINDOW]
    overflow = keys[DRIVER_WINDOW:]
    assert len(keys) - len(registry._DEFER) <= DRIVER_WINDOW, (
        "non-deferred query count exceeds the driver's correctness window; "
        "extend registry._DEFER with a redundant sibling"
    )
    assert set(overflow) <= set(registry._DEFER)
    assert not (set(registry._DEFER) & set(in_window[: len(keys) - len(registry._DEFER)]))


def test_deferred_queries_register_last_and_have_siblings():
    keys = list(build_queries())
    n_live = len(keys) - len(registry._DEFER)
    assert keys[n_live:] == [k for k in registry._DEFER if k in keys]
    in_window = set(keys[:DRIVER_WINDOW])
    for deferred, sibling in SIBLING.items():
        assert sibling in in_window, f"{deferred} deferred but sibling {sibling} not in window"


def test_round8_rotation_in_window():
    # VERDICT r7 tasks #3/#4 (rotation wave 2): the 12 prioritized
    # uncertified r6/r7-born queries plus approx_value_quantiles (GK-quantile
    # family representative restored) are inside the 50-row correctness
    # window this round, and orders_table_profile stays in to certify its
    # oracle-cast fix. (Earlier rounds' in-window assertions are superseded
    # by rotation; their driver certifications are on record in
    # CORRECTNESS_r{1..7}.json.)
    keys = list(build_queries())[:DRIVER_WINDOW]
    for q in [
        "atr_14_1h",
        "stochastic_14_3_1h",
        "tick_zscore_outliers",
        "text_ccnet_ppl_buckets",
        "dedup_exact_substring",
        "ticks_freshness_sla",
        "priority_shipmonth_q12",
        "disjunctive_revenue_q19",
        "dupgraph_pagerank",
        "bpe_train_merges",
        "dedup_keeper_centrality",
        "holt_forecast_1h",
        "approx_value_quantiles",
        "orders_table_profile",
    ]:
        assert q in keys, f"{q} still outside the driver window"


def test_every_query_key_unique_and_oracles_subset():
    queries = build_queries()
    oracles = build_oracles()
    unknown = set(oracles) - set(queries)
    assert not unknown, f"oracles without queries: {unknown}"
