"""Registry-window guard: the driver records CORRECTNESS for only the
first 50 ``queries()`` entries, so their composition is load-bearing —
an innocent dict reorder could silently rotate a never-verified query
out of (or a stale one into) the round's window.

Since r06 the order is COMPUTED from the rotation ledger
(rfb_data_pipeline_spark/rotation.py): never-driver-checked first,
then touched-since-their-row, then green oldest-first. These tests pin
the r08 composition the ledger must produce AND the ledger's own
freshness invariants, so a ledger edit that starves an entry fails
loudly.
"""

from __future__ import annotations

import __spark_entry__ as entry_mod
from rfb_data_pipeline_spark import rotation


def _names():
    return list(entry_mod.queries())


def test_r08_window_composition():
    names = _names()
    window = set(names[:50])
    # Tier 0 — never driver-checked: empty (v01/v02 got r07 rows).
    never_checked = {n for n in names if n not in rotation.LAST_DRIVER_ROW}
    assert never_checked == set()
    # Tier 1 — rows predating this round's code: the sketch pair
    # rebuilt hash-checkable in r08 (VERDICT r07 item 1).
    touched_stale = {
        n
        for n in names
        if rotation.LAST_TOUCHED.get(n, 0)
        > rotation.LAST_DRIVER_ROW.get(n, 99)
    }
    assert touched_stale == {
        "q24_approx_distinct", "q33_approx_quantiles",
        # injective key derivation (ADVICE r07)
        "v02_duplicate_keys_report",
        # session-memoized synthetic media frame (_media_cached)
        "m01_image_metadata", "m02_media_stats",
        "m03_frame_sample", "m04_audio_frames",
    }
    assert names[:7] == [
        "q24_approx_distinct", "q33_approx_quantiles",
        "m01_image_metadata", "m02_media_stats",
        "m03_frame_sample", "m04_audio_frames",
        "v02_duplicate_keys_report",
    ]
    # Tier 2 — oldest green rows next: the r04 q-tail the r07 verdict
    # flagged as freshness-forced (their newest driver rows are r04,
    # exactly CURRENT_ROUND - 4 if they missed this window).
    q_tail = {
        "q02_argmin_supplier", "q07_semi_join", "q08_anti_join",
        "q09_topk_per_group", "q10_monthly_lag", "q11_rollup_report",
        "q12_set_ops", "q13_string_functions", "q17_distinct_agg",
        "q19_cube", "q20_running_total", "q21_rank_suppliers",
        "q22_union_parts", "q23_median_stats", "q25_collect_set",
        "q26_intersect", "q27_above_nation_avg", "q28_grouping_sets",
        "q30_moving_range_sum", "q31_stats_agg", "q32_window_values",
    }
    assert set(names[7:28]) == q_tail
    # Remaining slots: the oldest r05-green entries by name.
    assert names[28:33] == [
        "d01_exact_dedup", "d06_incremental_dedup", "d10_fuzzy_pairs",
        "d13_duplicate_spans", "d14_dup_span_fraction",
    ]
    assert {
        "e15_gap_fill_locf", "m05_header_parse", "s01_knn_bruteforce",
        "s11_batch_knn", "s12_embedding_outliers",
    } <= window
    # NO slot burns on r06/r07-green untouched code.
    assert not (window & {
        "t19_bm25_search", "e20_ewma_baseline", "q01_pricing_summary",
        "q36_snapshot_diff", "v01_integrity_report", "d15_cc_star",
        "g07_edge_stream_replay",
    })
    # spill heads into the r09 promotions: the r05 s/t-tail (bumped by
    # the 7 tier-1 seats; their r05 rows are still inside the 3-round
    # cycle at r08, and r09's window re-seats them first)
    assert names[50:53] == [
        "s14_embedding_validation", "t12_zipf_slope", "t13_pii_redaction",
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
    # 146 at the r07 gate; r08 adds none (registry cap discipline:
    # 3 rounds x 50 slots = 150, VERDICT r07 item 4) but flips the
    # last two rows-only sketches to oracle-paired verdict rows.
    assert len(q) == 146
    assert set(o) <= set(q)
    # rows-only tier is EMPTY since r08: every registered query has a
    # DuckDB oracle twin (q24/q33 via verdict columns).
    rows_only = set(q) - set(o)
    assert rows_only == set()
