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
    # r5 rotation: 14 r1-r4-driver-green queries moved out, each with a
    # same-family twin still in the window.
    # r6 rotation: 11 r5-driver-green queries moved out so the 9 r5-born +
    # 2 r6-born operators get driver rows; each has a same-family twin
    # still in the window (ema_14_1h's twin runs its EXACT oracle through
    # the stateful-streaming path).
    # r7 rotation wave 1: 12 r6-driver-green queries moved out so 12 of the
    # 22 r6-born operators get driver rows; each keeps a same-family twin
    # still in the window (ohlc_1m / text_heavy_hitters_cms /
    # decontaminate_train_ngrams twins run their EXACT oracles).
    # r8 rotation wave 2: 13 r7-driver-green queries moved out so the 12
    # prioritized r6/r7-born operators + approx_value_quantiles (the
    # GK-quantile family's representative, VERDICT r7 task #4) get driver
    # rows; each keeps a same-family twin still in the window
    # (dim_scd2_merge_apply's twin runs its EXACT oracle through the
    # stricter stateful-streaming path).
    # (r17 wave 11: the five r7 rows that opened this block rotated back
    # INTO the window at the staleness bound; see the wave-11 block at
    # the end of this map.)
    # r9 rotation wave 3: ALL 15 never-driver-certified queries moved INTO
    # the window (certification backlog emptied); these 15 r8-driver-green
    # queries rotated out, each with a same-family twin in the window
    # (event_asof_tick_plain / streaming_rsi_14_1h run their rotated-out
    # twins' EXACT oracles; corpus_strip_dup_spans / bpe_encode_fertility /
    # dedup_lsh_eval apply the same trained artifacts or spans).
    # (r17 wave 11: event_asof_tick, backtest_pnl, events_value_histogram,
    # dedup_minhash_lsh, dedup_exact_substring, bpe_train_merges,
    # priority_shipmonth_q12, local_supplier_volume, candle_rollup,
    # atr_14_1h and dupgraph_pagerank rotated back INTO the window.)
    # (r18 wave 12: ticks_freshness_sla, rsi_14_1h, sma_golden_cross and
    # stochastic_14_3_1h — the last r8-evidence rows — rotated back INTO
    # the window at the staleness bound; see the wave-12 block at the end
    # of this map.)
    # r10 rotation wave 4: the 10 never-driver-certified queries (9 r9-born +
    # media_resize) moved INTO the window; these 10 r9-driver-green queries
    # rotated out, each with a same-family twin in the window
    # (idempotent_append_fresh runs streaming_firstwins_append's EXACT oracle;
    # events_compaction_plan / decontaminate_fuzzy_lsh / donchian_20_1h /
    # ichimoku_9_26_52_1h / dupgraph_triangle_stats / customer_rfm_segments /
    # media_dhash are the incoming family twins).
    # (r18 wave 12: the ten r9-evidence rows that stood here —
    # media_extract_meta, events_retention_plan, events_zorder_stats,
    # decontaminate_bloom_prefilter, dedup_keeper_centrality,
    # volatility_20_1h, pair_rolling_correlation, events_value_winsorize,
    # embedding_knn_ivfadc, streaming_firstwins_append — rotated back INTO
    # the window; see the wave-12 block at the end of this map.)
    # r11 rotation wave 5: ALL 14 never-driver-certified r10-born queries
    # moved INTO the window (backlog emptied again); these 14 r10-driver-green
    # queries rotated out, each with a same-family twin in the window — the
    # incoming r10-born queries ARE the twins (williams %R / CCI keep the
    # keyed native-window family, ADX the grouped Arrow-kernel family, the
    # four TPC-H newcomers the star/anti/scalar-broadcast families,
    # orphan-files the maintenance dry-runs, filtered-ANN + drift-report the
    # IVF family, ngram-diversity the text gates, containment the banded-LSH
    # family; media_dhash stays in window for the media kernels).
    "donchian_20_1h": "sma_14_1h",
    "ichimoku_9_26_52_1h": "sma_14_1h",
    "shipping_priority_q3": "market_share_q8",
    "disjunctive_revenue_q19": "market_share_q8",
    # (r18 wave 12: customer_rfm_segments rotated back INTO the window.)
    "events_compaction_plan": "events_orphan_files",
    "embedding_knn_ivf_kmeans": "embedding_ann_recall_eval",
    "text_quality_score": "text_ccnet_ppl_buckets",
    "dedup_lsh_eval": "streaming_ingest_dedup_gate",
    "holt_forecast_1h": "macd_12_26_9_1h",
    "returned_item_q10": "large_volume_q18",
    # (r18 wave 12: customers_no_open_orders_anti rotated back INTO the
    # window.)
    "media_resize": "media_frame_sample",
    "media_audio_features": "media_frame_sample",
    # r12 rotation wave 6: ALL 15 r11-born + the newly registered
    # streaming_ingest_dedup_gate moved INTO the window (backlog emptied);
    # these 16 r11-driver-green queries rotated out, each with a
    # same-family twin in the window — for most, the incoming r11-born
    # queries ARE the twins. williams_r_14_1h stays in-window for its
    # post--0.0-fix re-certification.
    "adx_14_1h": "macd_12_26_9_1h",
    "backtest_max_drawdown": "vwap_daily_1h",
    "cci_20_1h": "sma_14_1h",
    "late_shipment_q4": "market_share_q8",
    "top_supplier_q15": "large_volume_q18",
    "idle_rich_customers_q22": "custdist_q13",
    "promo_revenue_q14": "market_share_q8",
    "revenue_concentration_q11": "market_share_q8",
    "embedding_knn_filtered": "embedding_ann_recall_eval",
    "corpus_domain_mix": "corpus_dsir_resample",
    "dedup_minhash_containment": "streaming_ingest_dedup_gate",
    "streaming_enrich_dim_join": "streaming_ohlc_1m",
    "streaming_scd2_apply": "streaming_ingest_dedup_gate",
    "text_ngram_diversity": "text_ccnet_ppl_buckets",
    "orders_table_profile": "candle_returns_quartile",
    "candle_unpivot": "ohlc_1m",
    # r13 rotation wave 7: the 16 queries whose ONLY driver-green evidence
    # was round 1 moved back INTO the window (first driver contact since
    # the canon hardening closed classes 3-5); these 16 r12-driver-green
    # queries rotated out, each with a same-family twin in the window —
    # for several, the incoming r1-only queries ARE the twins.
    # vwap_daily_1h stays in-window for its post-fixed-point
    # re-certification (exactly the williams_r wave-6 precedent).
    "williams_r_14_1h": "sma_14_1h",
    "keltner_20_10_1h": "macd_12_26_9_1h",
    "obv_1h": "vwap_daily_1h",
    "candle_patterns_1h": "ohlc_1m",
    "incremental_cursor_scan": "watermark_max_time",
    "approx_value_quantiles": "candle_returns_quartile",
    "nation_volume_q7": "market_share_q8",
    "product_profit_q9": "market_share_q8",
    "small_qty_revenue_q17": "large_volume_q18",
    "waiting_supplier_q21": "custdist_q13",
    "dedup_incremental_minhash": "streaming_ingest_dedup_gate",
    "embedding_hard_negatives": "embedding_ann_recall_eval",
    "corpus_mixture_plan": "corpus_dsir_resample",
    "bpe_encode_fertility": "text_unigram_logprob",
    "text_tfidf_top_terms": "bm25_search",
    "media_dhash": "media_frame_sample",
    # r14 rotation wave 8: the 16 oldest-evidence queries (r2-r4 driver
    # rows) moved INTO the window; these 16 freshly-r13-certified queries
    # rotated out, each with a same-family twin in the window — for most,
    # the incoming oldest-evidence queries ARE the twins.
    # media_frame_sample, watermark_max_time and vwap_daily_1h stay
    # in-window as their families' only representatives.
    "avg_close_pivot": "ohlc_1m",
    "backtest_equity_curve": "vwap_daily_1h",
    "backtest_trades": "vwap_daily_1h",
    "candle_cube": "ohlc_1m",
    "dedup_ngram_jaccard": "streaming_ingest_dedup_gate",
    "embedding_knn_bruteforce": "embedding_ann_recall_eval",
    "embedding_knn_ivf": "embedding_ann_recall_eval",
    "embedding_near_dup": "embedding_ann_recall_eval",
    "embedding_near_dup_lsh": "embedding_ann_recall_eval",
    "event_type_copairs": "event_props_json_agg",
    "sma_dead_cross": "sma_14_1h",
    "sma_fanout_all_tf": "sma_14_1h",
    "spread_quantiles": "candle_returns_quartile",
    "text_fingerprint": "text_simhash",
    "text_token_count": "text_unigram_logprob",
    "text_top_terms_per_lang": "bm25_search",
    # r14 wave 8b: six freshly-r13-certified rows rotated out so the six
    # r14-born queries (ER + silhouette families, TPC-H 22/22 completion)
    # get birth-round driver rows; each keeps a same-family twin in window.
    "tick_zscore_outliers": "sma_14_1h",
    "approx_distinct_users": "parts_supplier_q16",
    "top_customers_page2_offset": "large_volume_q18",
    "latest_tick_per_pair": "watermark_max_time",
    "dim_broadcast_enrich": "market_share_q8",
    "ticks_dedup_second": "dedup_exact",
    # r15 rotation wave 9: the 16 RECERT_QUEUE rows (r4-r6 evidence) moved
    # INTO the window; these 16 freshly-r14-certified queries rotated out,
    # each with a same-family twin in the window — for most, the incoming
    # oldest-evidence queries ARE the twins. part_name_fuzzy_match,
    # embedding_cluster_silhouette and min_cost_supplier_q2 stay in-window
    # for post-change re-certification (blocking hardening / oracle
    # NULL+rid+overflow fixes / half_away_div rewrite); media_frame_sample,
    # watermark_max_time, vwap_daily_1h, sma_14_1h and text_simhash stay as
    # their families' only representatives.
    "ohlc_derived_multi_tf": "ohlc_1m",
    "trix_15_1h": "macd_12_26_9_1h",
    "event_asof_tick_plain": "event_asof_nearest_tick",
    "event_reaction_window": "event_asof_nearest_tick",
    "dedup_simhash": "dedup_exact",
    "dedup_passages": "streaming_ingest_dedup_gate",
    "dedup_connected_components": "dedup_cc_two_phase",
    "dupgraph_triangle_stats": "dedup_cc_two_phase",
    "text_repetition_filter": "text_ccnet_ppl_buckets",
    "corpus_pack_sequences": "text_rolling_fingerprint",
    "stratified_sample_by_lang": "corpus_dsir_resample",
    "embedding_quantize_int8": "embedding_pq_codes",
    "embedding_label_centroids": "embedding_cluster_silhouette",
    "embedding_ivf_drift_report": "embedding_ann_recall_eval",
    "daily_active_users": "parts_supplier_q16",
    "top_customers_by_open_value": "large_volume_q18",
    # r16 rotation wave 10: the 16 RECERT_QUEUE rows (eight r6-evidence
    # rows at the MAX_STALENESS_ROUNDS bound + eight oldest r7 rows) moved
    # INTO the window; these 16 freshly-r15-certified queries rotated out,
    # each with a same-family twin in the window — for most, the incoming
    # oldest-evidence queries ARE the twins.
    "tick_sessions": "streaming_ohlc_1m",
    "train_test_split": "corpus_dsir_resample",
    "candle_gap_fill": "ohlc_1m",
    "dim_scd2_history": "dim_scd2_merge_apply",
    "ema_14_1h": "macd_12_26_9_1h",
    "event_asof_next_tick": "event_asof_nearest_tick",
    "sample_weighted_quality": "corpus_dsir_resample",
    "streaming_sliding_stats": "streaming_ohlc_1m",
    "text_bigram_pmi": "bm25_search",
    "text_chunk_rag": "text_rolling_fingerprint",
    "text_pii_redact": "text_ccnet_ppl_buckets",
    "urgent_not_finished_setops": "custdist_q13",
    "user_funnel_conversion": "user_cohort_retention",
    "corpus_clean_pipeline": "streaming_ingest_dedup_gate",
    "decontaminate_train_ngrams": "decontaminate_fuzzy_lsh",
    "embedding_knn_pq_adc": "embedding_pq_codes",
    # r17 rotation wave 11: the 16 RECERT_QUEUE rows (five r7-evidence rows
    # at the MAX_STALENESS_ROUNDS bound + the eleven oldest r8 rows) moved
    # INTO the window; these 16 freshly-r16-certified rows rotated out,
    # each with a same-family twin staying in the window — for several,
    # the incoming oldest-evidence queries ARE the twins.
    # part_name_fuzzy_match stays in-window for its post-positional-filter
    # re-certification.
    "ticks_parse_validate": "ohlc_1m",
    "bollinger_20_2_1h": "sma_14_1h",
    "hybrid_search_rrf": "bm25_search",
    "embedding_knn_matryoshka": "embedding_ann_recall_eval",
    "embedding_knn_ivf_multiprobe": "embedding_ann_recall_eval",
    "text_heavy_hitters_cms": "streaming_heavy_hitters",
    "dedup_semantic_kmeans": "embedding_cluster_silhouette",
    "events_snapshot_diff": "events_orphan_files",
    "star_join_revenue": "market_share_q8",
    "returned_order_priority_semi": "custdist_q13",
    # (r18 wave 12 repointed forecast_revenue_q6 / min_cost_supplier_q2 /
    # corpus_strip_dup_spans: their former siblings rotated out this wave.)
    "forecast_revenue_q6": "large_volume_q18",
    "min_cost_supplier_q2": "market_share_q8",
    "excess_share_supplier_q20": "parts_supplier_q16",
    "streaming_dedup_exact": "streaming_ingest_dedup_gate",
    "streaming_ema_14_1h": "streaming_rsi_14_1h",
    "corpus_strip_dup_spans": "text_rolling_fingerprint",
    # r18 rotation wave 12: the 16 RECERT_QUEUE rows written at r17 (the
    # four r8-evidence rows at the MAX_STALENESS_ROUNDS bound, the ten r9
    # rows and the two oldest r10 rows) moved INTO the window; these 16
    # freshly-r17-certified rows rotated out, each with a same-family twin
    # staying in the window — for several, the incoming oldest-evidence
    # queries ARE the twins.
    "atr_14_1h": "volatility_20_1h",
    "backtest_pnl": "sma_golden_cross",
    "bpe_train_merges": "text_unigram_logprob",
    "candle_rollup": "ohlc_1m",
    "dedup_exact_substring": "text_rolling_fingerprint",
    "dedup_minhash_lsh": "decontaminate_fuzzy_lsh",
    "dupgraph_pagerank": "dedup_keeper_centrality",
    "event_asof_tick": "event_asof_nearest_tick",
    "events_value_histogram": "events_value_winsorize",
    "local_supplier_volume": "market_share_q8",
    "priority_shipmonth_q12": "custdist_q13",
    "streaming_sma_cross": "streaming_rsi_14_1h",
    "streaming_tick_sessions": "streaming_ohlc_1m",
    "streaming_view_click_join": "streaming_heavy_hitters",
    "text_lang_id": "text_ccnet_ppl_buckets",
    "tpch_pricing_summary": "large_volume_q18",
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
    # EXACT correspondence both ways (r10): a query deferred without a
    # declared in-window sibling — or a stale SIBLING entry for a key
    # rotated back into the window — breaks the rotation bookkeeping the
    # judge audits; both directions must stay in lockstep.
    assert set(registry._DEFER) == set(SIBLING), (
        f"missing siblings: {set(registry._DEFER) - set(SIBLING)}; "
        f"stale entries: {set(SIBLING) - set(registry._DEFER)}"
    )


def test_round18_rotation_in_window():
    # VERDICT r17 task #7 (rotation wave 12): the 16 RECERT_QUEUE rows
    # written at r17 — the four r8-evidence rows, whose driver evidence
    # reaches MAX_STALENESS_ROUNDS = 10 exactly at r18, the ten r9 rows
    # and the two oldest r10 rows — are inside the 50-row correctness
    # window this round, alongside the staying family-only
    # representatives. (Earlier rounds' in-window assertions are
    # superseded by rotation; their driver certifications are on record
    # in CORRECTNESS_r*.json.)
    keys = list(build_queries())[:DRIVER_WINDOW]
    for q in [
        # wave 12 incoming (the full r17 RECERT_QUEUE, front-first)
        "rsi_14_1h",
        "sma_golden_cross",
        "stochastic_14_3_1h",
        "ticks_freshness_sla",
        "decontaminate_bloom_prefilter",
        "dedup_keeper_centrality",
        "embedding_knn_ivfadc",
        "events_retention_plan",
        "events_value_winsorize",
        "events_zorder_stats",
        "media_extract_meta",
        "pair_rolling_correlation",
        "streaming_firstwins_append",
        "volatility_20_1h",
        "customer_rfm_segments",
        "customers_no_open_orders_anti",
        # staying family-only representatives (sibling targets)
        "media_frame_sample",
        "watermark_max_time",
        "vwap_daily_1h",
        "sma_14_1h",
        "ohlc_1m",
        "text_simhash",
        "text_rolling_fingerprint",
        "text_unigram_logprob",
        "streaming_ohlc_1m",
        "streaming_ingest_dedup_gate",
        "streaming_heavy_hitters",
        "streaming_rsi_14_1h",
        "user_cohort_retention",
        "custdist_q13",
        "bm25_search",
        "market_share_q8",
        "parts_supplier_q16",
        "large_volume_q18",
        "embedding_ann_recall_eval",
        "embedding_cluster_silhouette",
        "events_orphan_files",
        "event_asof_nearest_tick",
        "text_ccnet_ppl_buckets",
        "decontaminate_fuzzy_lsh",
        "idempotent_append_fresh",
    ]:
        assert q in keys, f"{q} still outside the driver window"


def _newest_green_rounds() -> tuple[dict[str, int], int]:
    """(query -> newest round with a driver-green row, max round on disk).

    Green = rows+schema match and the hash either matched or was not
    computed (rows-only checks for non-SQL-expressible ops record
    hash_match null). hash_match=false rows are NOT evidence.
    """
    import json
    import re
    from pathlib import Path

    root = Path(__file__).resolve().parent.parent
    newest: dict[str, int] = {}
    max_round = 0
    for path in sorted(root.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", path.name).group(1))
        max_round = max(max_round, rnd)
        for key, row in json.loads(path.read_text()).items():
            green = (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match") in (True, None)
            )
            if green:
                newest[key] = max(newest.get(key, 0), rnd)
    return newest, max_round


def test_recert_queue_matches_correctness_history():
    # VERDICT r13 task #6: the written re-certification queue must be
    # COMPUTED, not hand-maintained — the r13-written queue omitted the two
    # oldest-evidence queries in the registry (embedding_knn_ivf_multiprobe
    # at r2, event_props_json_agg at r3). registry.RECERT_QUEUE must equal
    # the 16 oldest-evidence queries outside the current window, ordered
    # strictly by (newest driver-green round, name).
    newest, _ = _newest_green_rounds()
    keys = list(build_queries())
    in_window = set(keys[:DRIVER_WINDOW])
    candidates = [
        q
        for _, q in sorted(
            (rnd, q) for q, rnd in newest.items()
            if q in set(keys) and q not in in_window
        )
    ]
    # the wave size is FIXED, never inferred from the written queue's own
    # length — truncating the expectation to len(RECERT_QUEUE) would let a
    # shortened/emptied queue pass the very invariant this test enforces
    # (the r13 omission class, relocated to the tail)
    wave_slots = 16
    expected = candidates[:wave_slots]
    assert len(registry.RECERT_QUEUE) == min(wave_slots, len(candidates))
    assert registry.RECERT_QUEUE == expected, (
        "registry.RECERT_QUEUE is stale — recompute it from the CORRECTNESS "
        f"files. Expected (oldest-first):\n{expected}"
    )


def test_registry_staleness_bounded():
    # Successor to the never-certified backlog invariant (vacuous since r13:
    # 174/174 queries hold a driver-green row). The live invariant — the
    # max-staleness ALARM of the r15 window-economics policy (VERDICT r14
    # task #3, PLANS.md): every registered query's newest driver-green
    # evidence is at most registry.MAX_STALENESS_ROUNDS old. The bound is
    # derived in registry.py next to the constant (refresh latency ~8.1
    # rounds at 130 deferred / 16 slots; 10 = latency + ~2 rounds slack,
    # firing well before the r13-era 11+-round rot). In-window queries are
    # exempt — they are being re-certified this round by construction.
    newest, max_round = _newest_green_rounds()
    keys = list(build_queries())
    in_window = set(keys[:DRIVER_WINDOW])
    # a never-certified query is acceptable ONLY while it sits in the
    # window awaiting its birth-round driver row (the r14 wave-8b births);
    # a never-certified DEFERRED query is the rot this invariant exists
    # to prevent.
    never = [q for q in keys if q not in newest and q not in in_window]
    assert not never, f"deferred queries with NO driver-green row: {never}"
    stale = {
        q: newest[q]
        for q in keys
        if q in newest
        and max_round - newest[q] > registry.MAX_STALENESS_ROUNDS
        and q not in in_window
    }
    assert not stale, (
        f"queries whose newest driver-green evidence is more than "
        f"{registry.MAX_STALENESS_ROUNDS} rounds old and which are not "
        f"being re-certified this round: {stale} — rotate them into the "
        f"window (RECERT_QUEUE front-first) or justify in PLANS.md"
    )


def test_every_query_key_unique_and_oracles_subset():
    queries = build_queries()
    oracles = build_oracles()
    unknown = set(oracles) - set(queries)
    assert not unknown, f"oracles without queries: {unknown}"


def test_defer_comments_name_in_window_sibling():
    # VERDICT r10 task #8 (registry hygiene): rotation reasoning must stay
    # machine-checkable as the registry grows — every _DEFER entry's inline
    # comment must name its CURRENT in-window sibling by exact key (the same
    # key the SIBLING map declares), so a rotation that repoints the map
    # without updating the human-readable ledger fails CI.
    import re
    from pathlib import Path

    src = (Path(__file__).resolve().parent.parent
           / "trading_etl_spark" / "registry.py").read_text().split("\n")
    start = next(i for i, l in enumerate(src) if l.startswith("_DEFER"))
    end = next(i for i, l in enumerate(src) if i > start and l.startswith("]"))
    entry_re = re.compile(r'^\s+"([a-z0-9_]+)",\s*(#.*)?$')
    comments: dict[str, str] = {}
    i = start + 1
    while i < end:
        m = entry_re.match(src[i])
        if m:
            key, parts, j = m.group(1), [src[i]], i + 1
            # continuation comment lines are the deeply-indented ones that
            # hang under the entry's trailing comment (block headers for the
            # next rotation wave start at 4-space indent and end the entry)
            while j < end and re.match(r"^\s+#", src[j]) and \
                    len(src[j]) - len(src[j].lstrip()) > 20:
                parts.append(src[j])
                j += 1
            comments[key] = " ".join(parts)
            i = j
        else:
            i += 1
    assert set(comments) == set(registry._DEFER)
    stale = [
        (k, SIBLING[k])
        for k, text in comments.items()
        if not re.search(r"\b" + re.escape(SIBLING[k]) + r"\b", text)
    ]
    assert not stale, f"_DEFER comments missing their sibling key: {stale}"
