"""Registry-window guard: the driver records CORRECTNESS for only the
first 50 ``queries()`` entries, so their composition is load-bearing —
an innocent dict reorder could silently rotate a never-verified query
out of (or a stale one into) the round's window.

Since r06 the order is COMPUTED from the rotation ledger
(rfb_data_pipeline_spark/rotation.py): never-driver-checked first,
then touched-since-their-row, then green oldest-first. These tests pin
the r11 composition the ledger must produce AND the ledger's own
freshness invariants, so a ledger edit that starves an entry fails
loudly.
"""

from __future__ import annotations

import __spark_entry__ as entry_mod
from rfb_data_pipeline_spark import rotation


def _names():
    return list(entry_mod.queries())


# The r07-green block whose rows are CURRENT_ROUND - 4 at r11: the
# freshness invariant FORCES every one of them into the r11 window
# (the r10 record's predicted spill started at x08_split_leakage).
R07_STALE = {
    "x08_split_leakage", "x09_pack_sequences", "x10_domain_mixture",
    "x17_cluster_curation",
}


def test_r11_window_composition():
    names = _names()
    window = set(names[:50])
    # Tier 0 — never driver-checked: EMPTY since the r10 fold (p01 was
    # the last never-checked entry; the registry is at its 150 cap).
    never_checked = {n for n in names if n not in rotation.LAST_DRIVER_ROW}
    assert never_checked == set()
    # Tier 1 — rows predating this round's code: s06's defaults became
    # N-adaptive (lsh_operating_point, VERDICT r10 item 2) so its r08
    # row predates the executed derivation path, and p01 executes the
    # r11-tightened sniff_encoding tail check (ADVICE r10).
    touched_stale = {
        n
        for n in names
        if rotation.LAST_TOUCHED.get(n, 0)
        > rotation.LAST_DRIVER_ROW.get(n, 99)
    }
    assert touched_stale == {
        "s06_near_dup_pairs_banded", "p01_pipeline_month_e2e",
    }
    assert names[0] == "s06_near_dup_pairs_banded"
    assert names[1] == "p01_pipeline_month_e2e"
    # The forced r07 tail all seat, right after the tier-1 entries.
    assert R07_STALE <= window
    assert set(names[: 2 + len(R07_STALE)]) == touched_stale | R07_STALE
    # Next-oldest green (r08 rows) fill the remaining 44 slots; the
    # two youngest-named r08 entries spill to positions 50-51, then
    # the r09 block begins.
    assert {
        "d01_exact_dedup", "e15_gap_fill_locf", "m01_image_metadata",
        "q02_argmin_supplier", "s01_knn_bruteforce",
    } <= window
    assert names[50] == "s11_batch_knn"
    assert names[51] == "s12_embedding_outliers"
    assert names[52] == "v02_duplicate_keys_report"
    assert names[53] == "d17_span_dedup_action"
    # NO slot burns on r09/r10-green untouched code.
    assert not (window & {
        "m09_jpeg_roundtrip",
        "m10_mjpeg_frames", "t10_cms_heavy_hitters",
        "x01_split_assign", "d02_ngram_jaccard", "e01_tumbling_hourly",
        "g05_graph_summary", "s16_ann_recall_verdict",
        "q24_approx_distinct", "e16_stream_replay",
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
