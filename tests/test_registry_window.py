"""Registry-window guard: the driver records CORRECTNESS for only the
first 50 ``queries()`` entries, so their composition is load-bearing —
an innocent dict reorder could silently rotate a never-verified query
out of (or a stale one into) the round's window.

Since r06 the order is COMPUTED from the rotation ledger
(rfb_data_pipeline_spark/rotation.py): never-driver-checked first,
then touched-since-their-row, then green oldest-first. These tests pin
the r06 composition the ledger must produce AND the ledger's own
freshness invariants, so a ledger edit that starves an entry fails
loudly.
"""

from __future__ import annotations

import __spark_entry__ as entry_mod
from rfb_data_pipeline_spark import rotation


def _names():
    return list(entry_mod.queries())


def test_r06_window_composition():
    names = _names()
    window = set(names[:50])
    # Tier 0 — the entries with NO driver row of any kind (r05-late
    # span-ACTION tier, graph family, EWMA, transition matrix,
    # posting lists + anything new this round). VERDICT r05 item 1.
    never_checked = {
        n for n in names if n not in rotation.LAST_DRIVER_ROW
    }
    assert {
        "d17_span_dedup_action", "d18_cleaned_corpus",
        "d19_decontaminate_action", "d20_incremental_span_dedup",
        "g01_item_pagerank", "g02_item_triangles", "g03_bfs_hops",
        "g04_item_similarity", "g05_graph_summary",
        "g06_lpa_communities", "e20_ewma_baseline",
        "e21_transition_matrix", "t18_posting_lists",
    } <= never_checked <= window
    # Tier 1 — rows that predate the r05 exactround conversion.
    touched_stale = {
        n
        for n in names
        if rotation.LAST_TOUCHED.get(n, 0)
        > rotation.LAST_DRIVER_ROW.get(n, 99)
    }
    assert touched_stale == {
        "q01_pricing_summary", "q03_topk_revenue",
        "q04_revenue_by_nation", "q05_region_revenue",
        "q06_forecast_revenue", "q14_date_functions",
        "q15_conditional_agg", "q16_having", "q18_range_join",
        "q29_ntile_percentile", "q34_histogram", "q35_unpivot",
        "e12_sequence_match",
        "t01_token_stats", "t02_quality_score", "t07_repetition",
        "t09_bpe_token_count", "x01_split_assign",
        "d15_cc_star",  # r06: oracle switched to the banded-pair twin
    }
    assert touched_stale <= window
    # Tier 2 — remaining slots go to the oldest green rows (r03),
    # oracle-paired first: s09/s10, the untouched t/x series. With 18
    # tier-0 (incl. the new g07/e22/t19/e23/q36) + 19 tier-1 entries,
    # 13 of the 18 r03 oracle-paired entries fit; x06-x10
    # (alphabetically last) and the rows-only m01-m03 spill to r07.
    assert {
        "s09_vector_stats", "s10_semantic_dedup",
        "t03_langid", "t04_fingerprint", "t05_top_terms",
        "t06_tfidf_top_terms", "t08_top_bigrams",
        "t10_cms_heavy_hitters", "t11_unigram_surprisal",
        "x02_cap_per_group", "x03_stratified_sample",
        "x04_chunk_documents", "x05_corpus_curation",
    } <= window
    # NO slot burns on r04/r05-green, untouched code: every q-series
    # name in the window is exactround-touched, no d/e-series beyond
    # the tiers above, no media row inside the window.
    assert not (window & {"d01_exact_dedup", "s01_knn_bruteforce",
                          "e01_tumbling_hourly", "q02_argmin_supplier",
                          "q17_distinct_agg", "x11_curriculum_buckets"})
    # spill heads straight into the r07 promotions
    assert names[50:58] == [
        "x06_shuffle_shard", "x07_upsert_merge", "x08_split_leakage",
        "x09_pack_sequences", "x10_domain_mixture", "m01_image_metadata",
        "m02_media_stats", "m03_frame_sample",
    ]


def test_ledger_invariants_hold():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    # ledger covers exactly the registered surface (minus brand-new
    # never-checked entries, which need no row)
    assert set(rotation.LAST_DRIVER_ROW) <= set(q), (
        sorted(set(rotation.LAST_DRIVER_ROW) - set(q))
    )
    assert set(rotation.LAST_TOUCHED) <= set(q)
    rotation.assert_ledger_invariants(list(q), set(o))
    rotation.assert_next_round_feasible(list(q), set(o))
    # the freshness rule is strict enough: anything never-checked or
    # touched-after-row MUST be inside the window, full stop
    names = list(q)
    window = set(names[:50])
    for n in names:
        dr = rotation.LAST_DRIVER_ROW.get(n)
        if dr is None or rotation.LAST_TOUCHED.get(n, 0) > dr:
            assert n in window, n


def test_every_query_has_unique_name_and_oracle_subset():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    # 121 at the r04 gate + e18/e19 (stream batch replays) + x17
    # (cluster-aware curation) + m07/m08 (ID3v1 + WAV header parses)
    # + d17/d18/d19/d20 (span-dedup action tier) + g01-g06 (graph
    # analytics) + e20 (EWMA) + e21 (transition matrix) + t18
    # (posting lists) + g07 (r06 — incremental edge-maintenance
    # batch replay, the graph stream's driver row) + e22 (r06 —
    # any-click funnel, the general skip semantics e17 lacks)
    # + t19 (r06 — BM25 lexical retrieval) + e23 (r06 — CUSUM
    # changepoint detection) + q36 (r06 — keyed snapshot diff, the
    # month_diff driver row)
    assert len(q) == 144
    assert set(o) <= set(q)
    # rows-only tier is exactly the sketches + media decode
    rows_only = set(q) - set(o)
    assert rows_only == {
        "q24_approx_distinct",
        "q33_approx_quantiles",
        "m01_image_metadata",
        "m02_media_stats",
        "m03_frame_sample",
        "m04_audio_frames",
    }
