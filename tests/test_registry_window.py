"""Registry-window guard: the driver records CORRECTNESS for only the
first 50 ``queries()`` entries, so their composition is load-bearing —
an innocent dict reorder could silently rotate a never-verified query
out of (or a stale one into) the round's window.

Since r06 the order is COMPUTED from the rotation ledger
(rfb_data_pipeline_spark/rotation.py): never-driver-checked first,
then touched-since-their-row, then green oldest-first. These tests pin
the r07 composition the ledger must produce AND the ledger's own
freshness invariants, so a ledger edit that starves an entry fails
loudly.
"""

from __future__ import annotations

import __spark_entry__ as entry_mod
from rfb_data_pipeline_spark import rotation


def _names():
    return list(entry_mod.queries())


def test_r07_window_composition():
    names = _names()
    window = set(names[:50])
    # Tier 0 — never driver-checked: the r07-new integrity rows.
    never_checked = {n for n in names if n not in rotation.LAST_DRIVER_ROW}
    assert never_checked == {
        "v01_integrity_report", "v02_duplicate_keys_report",
    }
    assert names[:2] == [
        "v01_integrity_report", "v02_duplicate_keys_report",
    ]
    # Tier 1 — rows predating this round's code: the rebuilt
    # hash-checkable codec tier (VERDICT r06 item 2).
    touched_stale = {
        n
        for n in names
        if rotation.LAST_TOUCHED.get(n, 0)
        > rotation.LAST_DRIVER_ROW.get(n, 99)
    }
    assert touched_stale == {
        # rebuilt hash-checkable codec tier (VERDICT r06 item 2)
        "m01_image_metadata", "m02_media_stats",
        "m03_frame_sample", "m04_audio_frames",
        # replay state folded forward (item 6)
        "g07_edge_stream_replay",
        # session-memoized shared graph base (_graph_shared)
        "g01_item_pagerank", "g02_item_triangles", "g03_bfs_hops",
        "g04_item_similarity", "g05_graph_summary",
        "g06_lpa_communities",
        # session-memoized shared shingle frame (_doc_shingles_cached):
        # direct consumers + the d02/d03-chain transitives
        "d02_ngram_jaccard", "d03_minhash_lsh", "d07_dedup_clusters",
        "d08_decontaminate", "d09_containment",
        "d12_minhash_calibration", "d15_cc_star",
        "d16_incremental_minhash", "x08_split_leakage",
        "x17_cluster_curation",
        # session-memoized shared PQ model (_pq_model_cached)
        "s13_pq_ann", "s15_ivf_pq_ann",
        # session-memoized exploded token stream (_toks_cached)
        "t07_repetition", "t08_top_bigrams",
        "t14_bigram_surprisal", "t18_posting_lists",
        # session-memoized simhash fingerprint frame (_simhash_df)
        "d04_simhash", "d05_simhash_pairs",
        # s03 rewritten as a blocked numpy outer product
        "s03_near_dup_pairs",
    }
    # tier 1 orders by newest-driver-row (oldest first), so the r03-row
    # x08 leads the touched block and the whole block sits at 2..31
    assert set(names[2:32]) == touched_stale
    assert names[5] == "x08_split_leakage"  # dr=3, oldest touched row
    # Tier 2 — oldest green rows next: the remaining r03 stragglers
    # (x06/x07/x09/x10 — x08 moved to tier 1), then the untouched r04
    # e-series exactly fills the window; the q-tail and the rows-only
    # sketches spill to r08, still inside the 3-round cycle (the
    # bounds-oracle tier covers q24/q33 locally every round).
    assert names[32:36] == [
        "x06_shuffle_shard", "x07_upsert_merge",
        "x09_pack_sequences", "x10_domain_mixture",
    ]
    assert {
        "e01_tumbling_hourly", "e14_max_concurrency", "e16_stream_replay",
    } <= window
    # NO slot burns on r05/r06-green untouched code.
    assert not (window & {
        "t19_bm25_search", "d01_exact_dedup", "e20_ewma_baseline",
        "q01_pricing_summary", "s14_embedding_validation",
        "q36_snapshot_diff",
    })
    # spill heads straight into the r08 promotions: the r04 q-tail
    assert names[50:53] == [
        "q02_argmin_supplier", "q07_semi_join", "q08_anti_join",
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
    # 144 at the r06 gate + v01/v02 (r07 — the README integrity suite
    # v1-v5 under the DuckDB oracle, VERDICT r06 item 5: v01 covers
    # v2 nulls + v3 formats + v4 referential, v02 covers v5 duplicate
    # keys + the v1 count gate)
    assert len(q) == 146
    assert set(o) <= set(q)
    # rows-only tier is exactly the approximate sketches: m01-m04
    # flipped to hash-checkable in r07 (integer decode metrics +
    # md5-hex-chain twins), leaving only the sketches (which the
    # local bounds-oracle tier covers, tests/test_bounds_oracle.py)
    rows_only = set(q) - set(o)
    assert rows_only == {
        "q24_approx_distinct",
        "q33_approx_quantiles",
    }
