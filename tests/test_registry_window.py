"""Registry-window guard: the driver records CORRECTNESS for only the
first 50 ``queries()`` entries, so their composition is load-bearing —
an innocent dict reorder could silently rotate a never-verified query
out of (or a stale one into) the round's window.

Since r06 the order is COMPUTED from the rotation ledger
(rfb_data_pipeline_spark/rotation.py): never-driver-checked first,
then touched-since-their-row, then green oldest-first. These tests pin
the r12 composition the ledger must produce AND the ledger's own
freshness invariants, so a ledger edit that starves an entry fails
loudly.
"""

from __future__ import annotations

import __spark_entry__ as entry_mod
from rfb_data_pipeline_spark import rotation


def _names():
    return list(entry_mod.queries())


# The only rows without a driver CORRECTNESS check since r08 — the
# r10 verdict's #1 forced set; they follow the r12-touched tier.
R08_STALE = (
    "s11_batch_knn", "s12_embedding_outliers",
    "v02_duplicate_keys_report",
)

# Rows whose executed code changed in r12 (rotation.LAST_TOUCHED):
# ordered by oldest driver row first within the tier.
R12_TOUCHED = (
    # dr=9 tier (name order)
    "d17_span_dedup_action", "d18_cleaned_corpus",
    "d20_incremental_span_dedup", "x12_repetition_gate",
    # dr=10 tier
    "m09_jpeg_roundtrip", "m10_mjpeg_frames",
    # dr=11 tier
    "d13_duplicate_spans", "d14_dup_span_fraction",
    "m01_image_metadata", "m02_media_stats", "m03_frame_sample",
    "m04_audio_frames", "p01_pipeline_month_e2e",
    "s06_near_dup_pairs_banded",
)


def test_r12_window_composition():
    names = _names()
    window = set(names[:50])
    # Tier 0 — never driver-checked: EMPTY since the r10 fold (p01 was
    # the last never-checked entry; the registry is at its 150 cap).
    never_checked = {n for n in names if n not in rotation.LAST_DRIVER_ROW}
    assert never_checked == set()
    # Tier 1 — rows predating this round's code: exactly the r12
    # touch set (span-table memo consumers, operating-point
    # derivation, collision-gate reorder, size-parameterized codec
    # tier).
    touched_stale = {
        n
        for n in names
        if rotation.LAST_TOUCHED.get(n, 0)
        > rotation.LAST_DRIVER_ROW.get(n, 99)
    }
    assert touched_stale == set(R12_TOUCHED)
    assert names[:14] == list(R12_TOUCHED)
    # then the r08-stale trio (the r11 verdict's #1 forced set)
    assert names[14:17] == list(R08_STALE)
    assert names[17] == "d19_decontaminate_action"
    # the r09-green block fills the rest oldest-first
    assert {
        "d19_decontaminate_action", "e16_stream_replay",
        "g07_edge_stream_replay", "q24_approx_distinct",
        "q36_snapshot_diff", "s16_ann_recall_verdict",
        "t06_tfidf_top_terms",
    } <= window
    # predicted spill: the tail of the r09 block from t09 onwards
    assert names[50] == "t09_bpe_token_count"
    assert names[51] == "t12_zipf_slope"
    # NO slot burns on r10/r11-green untouched code.
    assert not (window & {
        "x08_split_leakage", "x17_cluster_curation",
        "d01_exact_dedup", "q26_intersect", "s01_knn_bruteforce",
        "e01_tumbling_hourly", "d03_minhash_lsh", "g05_graph_summary",
    })


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
    # Registry cap discipline: 3 rounds x 50 slots = 150 (VERDICT r07
    # item 4). The cap is REACHED — net additions now require retiring
    # a row first (the ranked retirement policy lives in COVERAGE.md
    # r11; assert_next_round_feasible fails at edit time otherwise).
    assert 146 <= len(q) <= 150
    assert set(o) <= set(q)
    # rows-only tier is EMPTY since r08: every registered query has a
    # DuckDB oracle twin (q24/q33 via verdict columns).
    rows_only = set(q) - set(o)
    assert rows_only == set()


def test_retirement_policy_names_are_live():
    """Every pre-ranked retirement candidate must be a live registry
    row (a stale name would make the policy unusable exactly when
    it's needed), and the policy must never name the rows COVERAGE.md
    r11 marks as ineligible infrastructure."""
    q = entry_mod.queries()
    assert set(rotation.RETIREMENT_POLICY) <= set(q), (
        sorted(set(rotation.RETIREMENT_POLICY) - set(q))
    )
    assert len(set(rotation.RETIREMENT_POLICY)) == len(
        rotation.RETIREMENT_POLICY
    )
    ineligible = {
        "q12_set_ops", "s03_near_dup_pairs", "d13_duplicate_spans",
        "m01_image_metadata",
    }
    assert not ineligible & set(rotation.RETIREMENT_POLICY)
