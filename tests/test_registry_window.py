"""Registry-window guard: the driver records CORRECTNESS for only the
first 50 ``queries()`` entries, so their composition is load-bearing —
an innocent dict reorder could silently rotate a never-verified query
out of (or a stale one into) the round's window.

Since r06 the order is COMPUTED from the rotation ledger
(rfb_data_pipeline_spark/rotation.py): never-driver-checked first,
then touched-since-their-row, then green oldest-first. These tests pin
the r09 composition the ledger must produce AND the ledger's own
freshness invariants, so a ledger edit that starves an entry fails
loudly.
"""

from __future__ import annotations

import __spark_entry__ as entry_mod
from rfb_data_pipeline_spark import rotation


def _names():
    return list(entry_mod.queries())


# The r05-stale dozen the r08 verdict flagged: their newest driver rows
# are r05 (== CURRENT_ROUND - 4 at r09), so the freshness invariant
# FORCES them into the r09 window — the round's primary rotation goal.
R05_STALE = {
    "s14_embedding_validation", "t12_zipf_slope", "t13_pii_redaction",
    "t15_quality_classifier", "t16_html_extract", "t17_url_filter",
    "x11_curriculum_buckets", "x12_repetition_gate",
    "x13_weighted_sample", "x14_epoch_plan", "x15_split_drift",
    "x16_quality_mixture",
}


def test_r09_window_composition():
    names = _names()
    window = set(names[:50])
    # Tier 0 — never driver-checked: the r09 codec verdict rows plus
    # the ANN recall audit row.
    never_checked = {n for n in names if n not in rotation.LAST_DRIVER_ROW}
    assert never_checked == {
        "m09_jpeg_roundtrip", "m10_mjpeg_frames", "s16_ann_recall_verdict",
    }
    # Tier 1 — rows predating this round's code (r09 touches).
    touched_stale = {
        n
        for n in names
        if rotation.LAST_TOUCHED.get(n, 0)
        > rotation.LAST_DRIVER_ROW.get(n, 99)
    }
    assert touched_stale == {
        # q24: NULL-key mirroring in the exact tier (ADVICE r08 #2);
        # q33: boundary-consistent error bucket (ADVICE r08 #1)
        "q24_approx_distinct", "q33_approx_quantiles",
        # g07: K-plan driver loop collapsed into one cumulative-over-b
        # plan (VERDICT r08 item 3)
        "g07_edge_stream_replay",
        # e16: the curation funnel gates BEFORE fingerprint dedup in
        # all three rule copies (r09 streaming review)
        "e16_stream_replay",
    }
    # The forced dozen all seat, right after the tier-0/1 entries.
    assert R05_STALE <= window
    assert set(names[: 7 + len(R05_STALE)]) == (
        never_checked | touched_stale | R05_STALE
    )
    # Next-oldest green (r06 rows) fill the remaining slots (t10, t11
    # and t19, the youngest-named r06 entries, spill to positions
    # 50-52 — the three new tier-0 rows plus the e16 re-gate cost
    # exactly four green re-confirmations).
    assert {
        "d17_span_dedup_action", "e20_ewma_baseline",
        "q01_pricing_summary", "q36_snapshot_diff",
    } <= window
    assert names[50] == "t10_cms_heavy_hitters"
    assert names[51] == "t11_unigram_surprisal"
    assert names[52] == "t19_bm25_search"
    # NO slot burns on r07/r08-green untouched code.
    assert not (window & {
        "v01_integrity_report", "v02_duplicate_keys_report",
        "m01_image_metadata", "m05_header_parse",
        "d01_exact_dedup", "s02_ann_lsh",
        "x06_shuffle_shard", "q25_collect_set",
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
    # 146 at the r08 gate; registry cap discipline: 3 rounds x 50
    # slots = 150 (VERDICT r07 item 4), so at most 4 net additions.
    assert 146 <= len(q) <= 150
    assert set(o) <= set(q)
    # rows-only tier is EMPTY since r08: every registered query has a
    # DuckDB oracle twin (q24/q33 via verdict columns).
    rows_only = set(q) - set(o)
    assert rows_only == set()
