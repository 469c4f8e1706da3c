"""Correctness-window rotation ledger (VERDICT r05 item 2).

The driver records CORRECTNESS rows for only the FIRST 50
``queries()`` entries per round, so the registry order IS the audit
schedule. Through r05 the order was a hand-maintained list + comment;
that process let 13 brand-new operators ship with no driver row while
18 slots re-confirmed unchanged r03-green entries. This module makes
the schedule data-driven:

Priority (``window_order``):

1. **never-checked** — no driver CORRECTNESS row of any kind;
2. **touched-since-row** — code/oracle changed in a round LATER than
   the query's newest driver row (the row predates the current code);
3. **green** — oldest row first; within a round, oracle-paired before
   rows-only (a hash row is stronger evidence than a rows-only row,
   so rows-only entries yield slots when a round is tight).

Ties inside each tier break by name (deterministic).

Maintenance contract (enforced by tests/test_registry_window.py):

- When the driver lands ``CORRECTNESS_r{N}.json``, fold it in:
  every name in that file moves to ``LAST_DRIVER_ROW[name] = N``.
- When a round's work changes a query's Spark code OR oracle SQL,
  record ``LAST_TOUCHED[name] = CURRENT_ROUND``; brand-new queries
  need no entry (absence from LAST_DRIVER_ROW puts them in tier 1).
- Bump ``CURRENT_ROUND`` at the start of each round.
- Invariant: no registered query's newest driver row may be older
  than ``CURRENT_ROUND - 3`` unless it is inside the current window.
  The cycle length is ``ceil(len(names) / window)`` rounds;
  ``assert_ledger_invariants`` additionally asserts
  ``3 * window >= len(names)`` so the 3-round freshness bound stays
  satisfiable as the registry grows (ADVICE r06: the prose used to
  hard-code "139 entries / 3 rounds").
"""

from __future__ import annotations

CURRENT_ROUND = 14

# name -> newest driver CORRECTNESS round containing the name
# (union of CORRECTNESS_r01..r05; absent = never driver-checked).
LAST_DRIVER_ROW: dict[str, int] = {}
LAST_DRIVER_ROW.update(
    dict.fromkeys(
        (
            "m01_image_metadata", "m02_media_stats", "m03_frame_sample",
            "s09_vector_stats", "s10_semantic_dedup",
            "t01_token_stats", "t02_quality_score", "t03_langid",
            "t04_fingerprint", "t05_top_terms", "t06_tfidf_top_terms",
            "t07_repetition", "t08_top_bigrams", "t09_bpe_token_count",
            "t10_cms_heavy_hitters", "t11_unigram_surprisal",
            "x01_split_assign", "x02_cap_per_group",
            "x03_stratified_sample", "x04_chunk_documents",
            "x05_corpus_curation", "x06_shuffle_shard",
            "x07_upsert_merge", "x08_split_leakage",
            "x09_pack_sequences", "x10_domain_mixture",
        ),
        3,
    )
)
LAST_DRIVER_ROW.update(
    dict.fromkeys(
        (
            "e01_tumbling_hourly", "e02_sliding_window", "e03_sessionize",
            "e04_dedup_first", "e05_funnel", "e06_event_gaps",
            "e07_json_extract", "e08_pivot_event_types", "e09_asof_join",
            "e10_retention_cohorts", "e11_spike_detection",
            "e12_sequence_match", "e13_variant_extract",
            "e14_max_concurrency", "e16_stream_replay",
            "q01_pricing_summary", "q02_argmin_supplier",
            "q03_topk_revenue", "q04_revenue_by_nation",
            "q05_region_revenue", "q06_forecast_revenue", "q07_semi_join",
            "q08_anti_join", "q09_topk_per_group", "q10_monthly_lag",
            "q11_rollup_report", "q12_set_ops", "q13_string_functions",
            "q14_date_functions", "q15_conditional_agg", "q16_having",
            "q17_distinct_agg", "q18_range_join", "q19_cube",
            "q20_running_total", "q21_rank_suppliers", "q22_union_parts",
            "q23_median_stats", "q24_approx_distinct", "q25_collect_set",
            "q26_intersect", "q27_above_nation_avg", "q28_grouping_sets",
            "q29_ntile_percentile", "q30_moving_range_sum",
            "q31_stats_agg", "q32_window_values", "q33_approx_quantiles",
            "q34_histogram", "q35_unpivot",
        ),
        4,
    )
)
LAST_DRIVER_ROW.update(
    dict.fromkeys(
        (
            "d01_exact_dedup", "d02_ngram_jaccard", "d03_minhash_lsh",
            "d04_simhash", "d05_simhash_pairs", "d06_incremental_dedup",
            "d07_dedup_clusters", "d08_decontaminate", "d09_containment",
            "d10_fuzzy_pairs", "d12_minhash_calibration",
            "d13_duplicate_spans", "d14_dup_span_fraction", "d15_cc_star",
            "d16_incremental_minhash",
            "e15_gap_fill_locf", "e17_multistep_funnel",
            "e18_drift_replay", "e19_quality_replay",
            "m04_audio_frames", "m05_header_parse", "m06_subtitle_parse",
            "m07_id3_tag_parse", "m08_wav_header_parse",
            "s01_knn_bruteforce", "s02_ann_lsh", "s03_near_dup_pairs",
            "s04_label_centroids", "s05_ann_ivf",
            "s06_near_dup_pairs_banded", "s07_quantized_knn",
            "s08_kmeans_lloyd", "s11_batch_knn", "s12_embedding_outliers",
            "s13_pq_ann", "s14_embedding_validation", "s15_ivf_pq_ann",
            "t12_zipf_slope", "t13_pii_redaction", "t14_bigram_surprisal",
            "t15_quality_classifier", "t16_html_extract", "t17_url_filter",
            "x11_curriculum_buckets", "x12_repetition_gate",
            "x13_weighted_sample", "x14_epoch_plan", "x15_split_drift",
            "x16_quality_mixture", "x17_cluster_curation",
        ),
        5,
    )
)

# name -> latest round whose work changed the query's Spark code or
# oracle SQL. Only entries that were touched AFTER a driver row
# matter for ordering (tier 1); keeping same-round touches (e.g.
# t16: touched r05, row r05) is harmless and documents history.
LAST_TOUCHED: dict[str, int] = {}
LAST_TOUCHED.update(
    # r05 second-session exactround conversion (functions/exactround.py
    # class-wide HALF_UP rounding) rewrote these queries' rounded money
    # aggregates + SQL twins after their newest driver row.
    dict.fromkeys(
        (
            "q01_pricing_summary", "q03_topk_revenue",
            "q04_revenue_by_nation", "q05_region_revenue",
            "q06_forecast_revenue", "q14_date_functions",
            "q15_conditional_agg", "q16_having", "q18_range_join",
            "q29_ntile_percentile", "q34_histogram", "q35_unpivot",
            "e12_sequence_match",
            "t01_token_stats", "t02_quality_score", "t07_repetition",
            "t09_bpe_token_count", "t16_html_extract",
            "x01_split_assign",
        ),
        5,
    )
)
# r06: d15's oracle switched to the banded-pair CC twin (equality by
# construction, ADVICE r05) — its r05 row predates the new oracle.
LAST_TOUCHED["d15_cc_star"] = 6
# r07: the codec tier rebuilt hash-checkable (integer decode metrics +
# md5-hex-chain DuckDB twins) — VERDICT r06 item 2 — and g07's replay
# state folded forward instead of prefix-rescanned (item 6).
LAST_TOUCHED.update(
    dict.fromkeys(
        (
            "m01_image_metadata", "m02_media_stats",
            "m03_frame_sample", "m04_audio_frames",
            "g07_edge_stream_replay",
        ),
        7,
    )
)
# r07: g01-g06 now consume the session-memoized shared graph base
# (_graph_shared) — logically identical frames, but the executed code
# path changed, so their rows rotate back through the window. Same
# for the shingle consumers (_doc_shingles_cached): direct (d02, d03,
# d08, d09, d12, d16) and transitive via the d02/d03 chains (d07,
# d15, x08, x17).
LAST_TOUCHED.update(
    dict.fromkeys(
        (
            "g01_item_pagerank", "g02_item_triangles", "g03_bfs_hops",
            "g04_item_similarity", "g05_graph_summary",
            "g06_lpa_communities",
            "d02_ngram_jaccard", "d03_minhash_lsh", "d07_dedup_clusters",
            "d08_decontaminate", "d09_containment",
            "d12_minhash_calibration", "d15_cc_star",
            "d16_incremental_minhash",
            "x08_split_leakage", "x17_cluster_curation",
            # session-memoized shared PQ model (_pq_model_cached)
            "s13_pq_ann", "s15_ivf_pq_ann",
            # session-memoized exploded token stream (_toks_cached)
            "t07_repetition", "t08_top_bigrams",
            "t14_bigram_surprisal", "t18_posting_lists",
            # session-memoized simhash fingerprint frame (_simhash_df)
            "d04_simhash", "d05_simhash_pairs",
            # s03 rewritten as a blocked numpy outer product (20x)
            "s03_near_dup_pairs",
        ),
        7,
    )
)
LAST_DRIVER_ROW.update(
    # CORRECTNESS_r06.json fold-in: 50/50 green (rows+schema+hash).
    dict.fromkeys(
        (
            "d15_cc_star", "d17_span_dedup_action", "d18_cleaned_corpus",
            "d19_decontaminate_action", "d20_incremental_span_dedup",
            "e12_sequence_match", "e20_ewma_baseline",
            "e21_transition_matrix", "e22_any_click_funnel",
            "e23_cusum_changepoint",
            "g01_item_pagerank", "g02_item_triangles", "g03_bfs_hops",
            "g04_item_similarity", "g05_graph_summary",
            "g06_lpa_communities", "g07_edge_stream_replay",
            "q01_pricing_summary", "q03_topk_revenue",
            "q04_revenue_by_nation", "q05_region_revenue",
            "q06_forecast_revenue", "q14_date_functions",
            "q15_conditional_agg", "q16_having", "q18_range_join",
            "q29_ntile_percentile", "q34_histogram", "q35_unpivot",
            "q36_snapshot_diff",
            "s09_vector_stats", "s10_semantic_dedup",
            "t01_token_stats", "t02_quality_score", "t03_langid",
            "t04_fingerprint", "t05_top_terms", "t06_tfidf_top_terms",
            "t07_repetition", "t08_top_bigrams", "t09_bpe_token_count",
            "t10_cms_heavy_hitters", "t11_unigram_surprisal",
            "t18_posting_lists", "t19_bm25_search",
            "x01_split_assign", "x02_cap_per_group",
            "x03_stratified_sample", "x04_chunk_documents",
            "x05_corpus_curation",
        ),
        6,
    )
)


# r08: q24/q33 rebuilt hash-checkable (VERDICT r07 item 1) — verdict
# columns (exact long values + within-tolerance bool + integer error
# bucket) replace the raw engine-specific sketch estimates, retiring
# the rows-only tier and the local bounds oracle.
LAST_TOUCHED.update(
    dict.fromkeys(("q24_approx_distinct", "q33_approx_quantiles"), 8)
)
# r08: v02's key derivation made injective + fail-loud (ADVICE r07 —
# cnpj_ordem now carries the Euclidean quotient; same report values at
# fixture scale, but the executed code changed).
LAST_TOUCHED["v02_duplicate_keys_report"] = 8
# r08: m01-m04 consume the session-memoized synthetic media frame
# (media._media_cached — one materialization per session; identical
# deterministic payloads, but the executed path changed).
LAST_TOUCHED.update(
    dict.fromkeys(
        (
            "m01_image_metadata", "m02_media_stats",
            "m03_frame_sample", "m04_audio_frames",
        ),
        8,
    )
)
# NOT marked touched in r08: the session-memo centralization
# (rfb_data_pipeline_spark/memo.py, ADVICE r07) changed only the cache
# LOOKUP (key shape + eviction), never the build lambdas — every memo
# consumer executes the identical frame expressions, unlike the r07
# sweep where consumers switched from private builds to shared frames.

LAST_DRIVER_ROW.update(
    # CORRECTNESS_r07.json fold-in: 50/50 green (rows+schema+hash).
    dict.fromkeys(
        (
            "d02_ngram_jaccard", "d03_minhash_lsh", "d04_simhash",
            "d05_simhash_pairs", "d07_dedup_clusters",
            "d08_decontaminate", "d09_containment",
            "d12_minhash_calibration", "d15_cc_star",
            "d16_incremental_minhash",
            "e01_tumbling_hourly", "e02_sliding_window", "e03_sessionize",
            "e04_dedup_first", "e05_funnel", "e06_event_gaps",
            "e07_json_extract", "e08_pivot_event_types", "e09_asof_join",
            "e10_retention_cohorts", "e11_spike_detection",
            "e13_variant_extract", "e14_max_concurrency",
            "e16_stream_replay",
            "g01_item_pagerank", "g02_item_triangles", "g03_bfs_hops",
            "g04_item_similarity", "g05_graph_summary",
            "g06_lpa_communities", "g07_edge_stream_replay",
            "m01_image_metadata", "m02_media_stats", "m03_frame_sample",
            "m04_audio_frames",
            "s03_near_dup_pairs", "s13_pq_ann", "s15_ivf_pq_ann",
            "t07_repetition", "t08_top_bigrams", "t14_bigram_surprisal",
            "t18_posting_lists",
            "v01_integrity_report", "v02_duplicate_keys_report",
            "x06_shuffle_shard", "x07_upsert_merge", "x08_split_leakage",
            "x09_pack_sequences", "x10_domain_mixture",
            "x17_cluster_curation",
        ),
        7,
    )
)


# r09: q24's exact tier now skips NULL keys (ADVICE r08 #2) and the
# shared _sketch_verdict bucket is gated on `within` (ADVICE r08 #1)
# — q33 consumes the same helper; g07's replay collapsed from a
# K-plan driver loop into one cumulative-over-batch plan (VERDICT
# r08 item 3).
LAST_TOUCHED.update(
    dict.fromkeys(
        (
            "q24_approx_distinct", "q33_approx_quantiles",
            "g07_edge_stream_replay",
        ),
        9,
    )
)
# r09 streaming review: the curation funnel now gates BEFORE the
# fingerprint dedup in all three copies (curated_stream,
# curated_batch, and e16's SQL twin) — a gate-failing case-variant
# can no longer shadow a passing twin, and the changed code + oracle
# postdate e16's newest driver row.
LAST_TOUCHED["e16_stream_replay"] = 9

LAST_DRIVER_ROW.update(
    # CORRECTNESS_r08.json fold-in: 50/50 green (rows+schema+hash),
    # seating the r07 verdict's forced set (q24/q33 verdict rows,
    # m01-m04 post-memoization, v02 post-injective-key, the r04
    # q-tail, and the oldest r05-green block).
    dict.fromkeys(
        (
            "q24_approx_distinct", "q33_approx_quantiles",
            "m01_image_metadata", "m02_media_stats", "m03_frame_sample",
            "m04_audio_frames", "v02_duplicate_keys_report",
            "q02_argmin_supplier", "q07_semi_join", "q08_anti_join",
            "q09_topk_per_group", "q10_monthly_lag", "q11_rollup_report",
            "q12_set_ops", "q13_string_functions", "q17_distinct_agg",
            "q19_cube", "q20_running_total", "q21_rank_suppliers",
            "q22_union_parts", "q23_median_stats", "q25_collect_set",
            "q26_intersect", "q27_above_nation_avg",
            "q28_grouping_sets", "q30_moving_range_sum",
            "q31_stats_agg", "q32_window_values",
            "d01_exact_dedup", "d06_incremental_dedup",
            "d10_fuzzy_pairs", "d13_duplicate_spans",
            "d14_dup_span_fraction",
            "e15_gap_fill_locf", "e17_multistep_funnel",
            "e18_drift_replay", "e19_quality_replay",
            "m05_header_parse", "m06_subtitle_parse",
            "m07_id3_tag_parse", "m08_wav_header_parse",
            "s01_knn_bruteforce", "s02_ann_lsh", "s04_label_centroids",
            "s05_ann_ivf", "s06_near_dup_pairs_banded",
            "s07_quantized_knn", "s08_kmeans_lloyd", "s11_batch_knn",
            "s12_embedding_outliers",
        ),
        8,
    )
)


# r10: the jpeg decoder's ZRL overflow guard tightened to k >= 64
# (ADVICE r09) — m09/m10 execute decode_jpeg on every row, so their
# executed code changed even though valid streams decode identically.
LAST_TOUCHED.update(
    dict.fromkeys(("m09_jpeg_roundtrip", "m10_mjpeg_frames"), 10)
)

LAST_DRIVER_ROW.update(
    # CORRECTNESS_r09.json fold-in: 50/50 green (rows+schema+hash),
    # seating the r08 verdict's forced set (the 12 r05-stale rows,
    # the three tier-0 codec/ANN-audit rows m09/m10/s16, and the
    # r09-touched q24/q33/g07/e16) plus the oldest r06-green block.
    dict.fromkeys(
        (
            "m09_jpeg_roundtrip", "m10_mjpeg_frames",
            "s16_ann_recall_verdict",
            "e16_stream_replay", "g07_edge_stream_replay",
            "q24_approx_distinct", "q33_approx_quantiles",
            "s14_embedding_validation",
            "t12_zipf_slope", "t13_pii_redaction",
            "t15_quality_classifier", "t16_html_extract",
            "t17_url_filter",
            "x11_curriculum_buckets", "x12_repetition_gate",
            "x13_weighted_sample", "x14_epoch_plan", "x15_split_drift",
            "x16_quality_mixture",
            "d17_span_dedup_action", "d18_cleaned_corpus",
            "d19_decontaminate_action", "d20_incremental_span_dedup",
            "e12_sequence_match", "e20_ewma_baseline",
            "e21_transition_matrix", "e22_any_click_funnel",
            "e23_cusum_changepoint",
            "q01_pricing_summary", "q03_topk_revenue",
            "q04_revenue_by_nation", "q05_region_revenue",
            "q06_forecast_revenue", "q14_date_functions",
            "q15_conditional_agg", "q16_having", "q18_range_join",
            "q29_ntile_percentile", "q34_histogram", "q35_unpivot",
            "q36_snapshot_diff",
            "s09_vector_stats", "s10_semantic_dedup",
            "t01_token_stats", "t02_quality_score", "t03_langid",
            "t04_fingerprint", "t05_top_terms", "t06_tfidf_top_terms",
            "t09_bpe_token_count",
        ),
        9,
    )
)


# r11: s06's (num_tables, sign_bits) defaults became N-adaptive via
# lsh_operating_point (VERDICT r10 item 2) — at every test SF the
# derivation lands on the frozen anchor (16, 6) so the oracle hash is
# unchanged, but the executed code path (count + derivation) changed.
# Other r11 fixes (encode_gif palette cap, dedup_stream marker guard,
# decode_bmp weak-magic classification) touch test-only surfaces — no
# registry row executes them.
LAST_TOUCHED["s06_near_dup_pairs_banded"] = 11
# r11: sniff_encoding's widened re-sample tail check tightened to the
# incremental decode (junk in the widened tail now falls through to
# 8-bit discrimination instead of reading as utf-8, ADVICE r10) — p01
# executes sniff_encoding on every month file, so its executed code
# changed even though the fixture files classify identically.
LAST_TOUCHED["p01_pipeline_month_e2e"] = 11

LAST_DRIVER_ROW.update(
    # CORRECTNESS_r10.json fold-in: 50/50 green (rows+schema+hash),
    # seating the r09 verdict's forced set (p01 first-ever row, the
    # jpeg-guard-touched m09/m10, the full r06-stale tail
    # t10/t11/t19/x01-x05) plus the oldest r07-green block through
    # x07 (spill at x08_split_leakage per the r10 record).
    dict.fromkeys(
        (
            "p01_pipeline_month_e2e",
            "m09_jpeg_roundtrip", "m10_mjpeg_frames",
            "t10_cms_heavy_hitters", "t11_unigram_surprisal",
            "t19_bm25_search",
            "x01_split_assign", "x02_cap_per_group",
            "x03_stratified_sample", "x04_chunk_documents",
            "x05_corpus_curation",
            "d02_ngram_jaccard", "d03_minhash_lsh", "d04_simhash",
            "d05_simhash_pairs", "d07_dedup_clusters",
            "d08_decontaminate", "d09_containment",
            "d12_minhash_calibration", "d15_cc_star",
            "d16_incremental_minhash",
            "e01_tumbling_hourly", "e02_sliding_window", "e03_sessionize",
            "e04_dedup_first", "e05_funnel", "e06_event_gaps",
            "e07_json_extract", "e08_pivot_event_types", "e09_asof_join",
            "e10_retention_cohorts", "e11_spike_detection",
            "e13_variant_extract", "e14_max_concurrency",
            "g01_item_pagerank", "g02_item_triangles", "g03_bfs_hops",
            "g04_item_similarity", "g05_graph_summary",
            "g06_lpa_communities",
            "s03_near_dup_pairs", "s13_pq_ann", "s15_ivf_pq_ann",
            "t07_repetition", "t08_top_bigrams", "t14_bigram_surprisal",
            "t18_posting_lists",
            "v01_integrity_report",
            "x06_shuffle_shard", "x07_upsert_merge",
        ),
        10,
    )
)


LAST_DRIVER_ROW.update(
    # CORRECTNESS_r11.json fold-in: 50/50 green (rows+schema+hash),
    # seating the r10 verdict's forced set (r11-touched s06/p01 first,
    # then the r07-stale x08/x09/x10/x17 tail) plus the oldest
    # r08-green block (spill at s11_batch_knn per the r11 record).
    dict.fromkeys(
        (
            "s06_near_dup_pairs_banded", "p01_pipeline_month_e2e",
            "x08_split_leakage", "x09_pack_sequences",
            "x10_domain_mixture", "x17_cluster_curation",
            "d01_exact_dedup", "d06_incremental_dedup",
            "d10_fuzzy_pairs", "d13_duplicate_spans",
            "d14_dup_span_fraction",
            "e15_gap_fill_locf", "e17_multistep_funnel",
            "e18_drift_replay", "e19_quality_replay",
            "m01_image_metadata", "m02_media_stats", "m03_frame_sample",
            "m04_audio_frames", "m05_header_parse",
            "m06_subtitle_parse", "m07_id3_tag_parse",
            "m08_wav_header_parse",
            "q02_argmin_supplier", "q07_semi_join", "q08_anti_join",
            "q09_topk_per_group", "q10_monthly_lag", "q11_rollup_report",
            "q12_set_ops", "q13_string_functions", "q17_distinct_agg",
            "q19_cube", "q20_running_total", "q21_rank_suppliers",
            "q22_union_parts", "q23_median_stats", "q25_collect_set",
            "q26_intersect", "q27_above_nation_avg",
            "q28_grouping_sets", "q30_moving_range_sum",
            "q31_stats_agg", "q32_window_values",
            "s01_knn_bruteforce", "s02_ann_lsh", "s04_label_centroids",
            "s05_ann_ivf", "s07_quantized_knn", "s08_kmeans_lloyd",
        ),
        11,
    )
)


# r12 touches: s06's operating-point derivation now memoizes the
# corpus count and ladder-fills partial pins (_fill_operating_point,
# ADVICE r11); p01 executes the reordered routable-only member
# collision gate (pipeline/run.py, ADVICE r11); d13/d14 consume the
# session-memoized _span_table_cached (the r07 shared-frame
# precedent: consumers switched from private builds to a shared
# memoized frame) and x12 transitively via d14; the media codec tier
# m01-m04/m09/m10 now threads a size parameter through to the
# synthesizer (the r12 fuzz axis) and m02's per-kind size join became
# a left join (empty-kind parity).
LAST_TOUCHED.update(
    dict.fromkeys(
        (
            "s06_near_dup_pairs_banded", "p01_pipeline_month_e2e",
            "d13_duplicate_spans", "d14_dup_span_fraction",
            "x12_repetition_gate",
            "m01_image_metadata", "m02_media_stats", "m03_frame_sample",
            "m04_audio_frames", "m09_jpeg_roundtrip", "m10_mjpeg_frames",
            # _doc_spans grew the wide-key branch (evaluated default-
            # off on every call): d17/d18 thread the kwarg, d20's
            # probe path executes the changed function
            "d17_span_dedup_action", "d18_cleaned_corpus",
            "d20_incremental_span_dedup",
        ),
        12,
    )
)

LAST_DRIVER_ROW.update(
    # CORRECTNESS_r12.json fold-in: 50/50 green (rows+schema+hash).
    dict.fromkeys(
        (
            "d13_duplicate_spans", "d14_dup_span_fraction",
            "d17_span_dedup_action", "d18_cleaned_corpus",
            "d19_decontaminate_action", "d20_incremental_span_dedup",
            "e12_sequence_match", "e16_stream_replay", "e20_ewma_baseline",
            "e21_transition_matrix", "e22_any_click_funnel",
            "e23_cusum_changepoint", "g07_edge_stream_replay",
            "m01_image_metadata", "m02_media_stats", "m03_frame_sample",
            "m04_audio_frames", "m09_jpeg_roundtrip", "m10_mjpeg_frames",
            "p01_pipeline_month_e2e", "q01_pricing_summary",
            "q03_topk_revenue", "q04_revenue_by_nation",
            "q05_region_revenue", "q06_forecast_revenue",
            "q14_date_functions", "q15_conditional_agg", "q16_having",
            "q18_range_join", "q24_approx_distinct",
            "q29_ntile_percentile", "q33_approx_quantiles",
            "q34_histogram", "q35_unpivot", "q36_snapshot_diff",
            "s06_near_dup_pairs_banded", "s09_vector_stats",
            "s10_semantic_dedup", "s11_batch_knn",
            "s12_embedding_outliers", "s14_embedding_validation",
            "s16_ann_recall_verdict", "t01_token_stats",
            "t02_quality_score", "t03_langid", "t04_fingerprint",
            "t05_top_terms", "t06_tfidf_top_terms",
            "v01_integrity_report", "v02_duplicate_keys_report",
            "x12_repetition_gate",
        ),
        12,
    )
)

# r13 touches (optimization round 1): shared-base memos extended —
# the g-family consumes memoized nodes/deg/oriented-arcs/arcs_s
# (g01/g03/g06 additionally restructured their iteration loops:
# fewer exchanges per round, bit-identical values), d02/d09 consume
# the memoized capped-shingle table, d03/d16 (and d15 transitively)
# the memoized MinHash bucket table, d17/d18/d19/d20 the memoized
# narrow span-hash table, s06 the memoized narrow LSH bucket index;
# cc_star's nodes frame went lazy (d15/g05/x17 execute the changed
# helper); d12 transitively via d02.
LAST_TOUCHED.update(
    dict.fromkeys(
        (
            "g01_item_pagerank", "g02_item_triangles", "g03_bfs_hops",
            "g04_item_similarity", "g05_graph_summary",
            "g06_lpa_communities",
            "d02_ngram_jaccard", "d03_minhash_lsh", "d09_containment",
            "d12_minhash_calibration", "d15_cc_star",
            "d16_incremental_minhash",
            "d17_span_dedup_action", "d18_cleaned_corpus",
            "d19_decontaminate_action", "d20_incremental_span_dedup",
            "s06_near_dup_pairs_banded", "x17_cluster_curation",
        ),
        13,
    )
)

# r13 session-2 touches the r13 ledger update missed (VERDICT r13
# item 2): commits aa221a7/6de526d substituted the memoized token
# stream into t05/t06/t10/t11/t19, the memoized shingle table into
# x05, and the memoized reference unigrams into e18 AFTER the 18-name
# list above was recorded — their newest driver rows (r12 or r10)
# predate the executed code, so they must rotate into the r14 window.
LAST_TOUCHED.update(
    dict.fromkeys(
        (
            "t05_top_terms", "t06_tfidf_top_terms",
            "t10_cms_heavy_hitters", "t11_unigram_surprisal",
            "t19_bm25_search", "x05_corpus_curation",
            "e18_drift_replay",
        ),
        13,
    )
)

LAST_DRIVER_ROW.update(
    # CORRECTNESS_r13.json fold-in: 50/50 green (rows+schema+hash),
    # covering every r13-ledger-declared touched row.
    dict.fromkeys(
        (
            "d02_ngram_jaccard", "d03_minhash_lsh", "d04_simhash",
            "d05_simhash_pairs", "d07_dedup_clusters",
            "d08_decontaminate", "d09_containment",
            "d12_minhash_calibration", "d15_cc_star",
            "d16_incremental_minhash",
            "d17_span_dedup_action", "d18_cleaned_corpus",
            "d19_decontaminate_action", "d20_incremental_span_dedup",
            "e01_tumbling_hourly", "e02_sliding_window", "e03_sessionize",
            "e04_dedup_first", "e05_funnel", "e06_event_gaps",
            "e07_json_extract", "e08_pivot_event_types", "e09_asof_join",
            "e10_retention_cohorts", "e11_spike_detection",
            "e13_variant_extract", "e14_max_concurrency",
            "g01_item_pagerank", "g02_item_triangles", "g03_bfs_hops",
            "g04_item_similarity", "g05_graph_summary",
            "g06_lpa_communities",
            "s03_near_dup_pairs", "s06_near_dup_pairs_banded",
            "s13_pq_ann", "s15_ivf_pq_ann",
            "t07_repetition", "t09_bpe_token_count", "t12_zipf_slope",
            "t13_pii_redaction", "t15_quality_classifier",
            "t16_html_extract", "t17_url_filter",
            "x11_curriculum_buckets", "x13_weighted_sample",
            "x14_epoch_plan", "x15_split_drift", "x16_quality_mixture",
            "x17_cluster_curation",
        ),
        13,
    )
)

# r14 touches (optimization round 2): d10's candidate tiers gained
# exact-by-construction cuts (self-join orientation, length banding,
# xxhash64 gram keys) and the banded levenshtein(threshold) verify;
# its pfx boundary went lazy. e03 moved from the native
# session_window operator to the gaps-and-islands shape (identical
# session semantics incl. the exact-gap merge rule; output verified
# row-identical). g07's per_bui boundary went lazy (plan prefix only).
# x16/e17/e22: the per-invocation multi-consumer boundary went lazy
# (one fewer job per rep; outputs identical, oracle-verified). x11's
# lazy prototype measured SLOWER (racing broadcast consumers) and was
# reverted — its executed code is unchanged from its r13-checked
# state, so it carries no r14 touch entry.
LAST_TOUCHED.update(
    dict.fromkeys(
        (
            "d10_fuzzy_pairs", "e03_sessionize", "g07_edge_stream_replay",
            "x16_quality_mixture",
            "e17_multistep_funnel", "e22_any_click_funnel",
            # s06/s11: per-pair norms hoisted to the join inputs
            # (bit-identical cosines; 3x less scoring math)
            "s06_near_dup_pairs_banded", "s11_batch_knn",
            # s08 + the PQ encode pass (s13/s15 via _pq_model): the
            # row_number argmin became a min-of-struct hash aggregate
            # (identical (d2 asc, cid asc) tie-break, no sort)
            "s08_kmeans_lloyd", "s13_pq_ann", "s15_ivf_pq_ann",
        ),
        14,
    )
)

# The registry is at its 150-entry cap (3 rounds x 50 slots), so any
# future net addition must retire a row first. The ranked candidates
# below were reviewed in COVERAGE.md (r11, VERDICT r10 item 5) BEFORE
# any retirement was needed — a retirement takes the list's head, not
# an under-pressure pick. Retiring = dropping the queries()/oracle
# entries and this ledger's rows; the implementation and its pytest
# coverage stay.
RETIREMENT_POLICY: tuple[str, ...] = (
    "q26_intersect",        # near-twin of q12_set_ops
    "m05_header_parse",     # subsumed by the real decode tiers (m01/m09/m10)
    "d14_dup_span_fraction",  # re-aggregation of d13's span table
    "q22_union_parts",      # set-op family overlap (q12/q26)
    "e02_sliding_window",   # parameterization of e01/e14/q30 shapes
)


def window_order(names: list[str], oracle_names: set[str]) -> list[str]:
    """Full registry order under the rotation priority; the first
    ``window`` entries are the round's correctness window."""

    def key(n: str):
        dr = LAST_DRIVER_ROW.get(n)
        if dr is None:
            return (0, 0, 0, n)  # never driver-checked
        if LAST_TOUCHED.get(n, 0) > dr:
            return (1, dr, 0, n)  # row predates current code
        return (2, dr, n not in oracle_names, n)  # green, oldest first

    return sorted(names, key=key)


def assert_ledger_invariants(
    names: list[str], oracle_names: set[str], window: int = 50
) -> None:
    """The window-freshness contract (cheap; callable from tests)."""
    assert 3 * window >= len(names), (
        f"registry has {len(names)} entries but 3 rounds of a "
        f"{window}-slot window cover only {3 * window}: the 3-round "
        "freshness invariant is unsatisfiable — widen the window or "
        "relax the cycle bound"
    )
    order = window_order(names, oracle_names)
    in_window = set(order[:window])
    for n in names:
        dr = LAST_DRIVER_ROW.get(n)
        if n in in_window:
            continue
        assert dr is not None, f"{n}: never driver-checked yet outside window"
        assert LAST_TOUCHED.get(n, 0) <= dr, (
            f"{n}: touched in r{LAST_TOUCHED[n]} after its r{dr} row, "
            "yet outside the window"
        )
        assert dr >= CURRENT_ROUND - 3, (
            f"{n}: newest driver row r{dr} is older than the 3-round "
            f"cycle at r{CURRENT_ROUND} and it missed the window"
        )


def assert_next_round_feasible(
    names: list[str], oracle_names: set[str], window: int = 50
) -> None:
    """Adding many new queries in one round steals window slots from
    stale entries; this lookahead simulates the driver recording the
    CURRENT window, then checks the NEXT round can still seat every
    entry the freshness invariant will force into it. Fails while the
    over-addition is still editable, not a round later."""
    order = window_order(names, oracle_names)
    simulated = dict(LAST_DRIVER_ROW)
    for n in order[:window]:
        simulated[n] = CURRENT_ROUND
    nxt = CURRENT_ROUND + 1
    required = [
        n
        for n in names
        if simulated.get(n) is None
        or LAST_TOUCHED.get(n, 0) > simulated[n]
        or simulated[n] < nxt - 3
    ]
    assert len(required) <= window, (
        f"r{nxt} must seat {len(required)} entries in a {window}-slot "
        f"window: {sorted(required)[:12]}... The registry is over-"
        "subscribed — retire the head of RETIREMENT_POLICY (ranked in "
        "COVERAGE.md r11) before adding rows."
    )
