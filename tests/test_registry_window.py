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


# The 11 rows whose newest driver row is r09 — the r12 verdict's #1
# forced set; they follow the r13-touched tier and all fit the window.
R09_STALE = (
    "t09_bpe_token_count", "t12_zipf_slope", "t13_pii_redaction",
    "t15_quality_classifier", "t16_html_extract", "t17_url_filter",
    "x11_curriculum_buckets", "x13_weighted_sample", "x14_epoch_plan",
    "x15_split_drift", "x16_quality_mixture",
)

# Rows whose executed code changed in r13 (rotation.LAST_TOUCHED):
# the optimization round's shared-base memos + loop restructures,
# ordered by oldest driver row first within the tier.
R13_TOUCHED = (
    # dr=10 tier (name order)
    "d02_ngram_jaccard", "d03_minhash_lsh", "d09_containment",
    "d12_minhash_calibration", "d15_cc_star", "d16_incremental_minhash",
    "g01_item_pagerank", "g02_item_triangles", "g03_bfs_hops",
    "g04_item_similarity", "g05_graph_summary", "g06_lpa_communities",
    # dr=11 tier
    "x17_cluster_curation",
    # dr=12 tier
    "d17_span_dedup_action", "d18_cleaned_corpus",
    "d19_decontaminate_action", "d20_incremental_span_dedup",
    "s06_near_dup_pairs_banded",
)


def test_r13_window_composition():
    names = _names()
    window = set(names[:50])
    # Tier 0 — never driver-checked: EMPTY since the r10 fold (p01 was
    # the last never-checked entry; the registry is at its 150 cap).
    never_checked = {n for n in names if n not in rotation.LAST_DRIVER_ROW}
    assert never_checked == set()
    # Tier 1 — rows predating this round's code: exactly the r13
    # touch set (optimization-round memo consumers + restructured
    # iteration loops).
    touched_stale = {
        n
        for n in names
        if rotation.LAST_TOUCHED.get(n, 0)
        > rotation.LAST_DRIVER_ROW.get(n, 99)
    }
    assert touched_stale == set(R13_TOUCHED)
    assert names[:18] == list(R13_TOUCHED)
    # then the full r09-stale block (the r12 verdict's #1 forced set):
    # every one of the 11 lands inside THIS round's window.
    assert names[18:29] == list(R09_STALE)
    # the r10-green block fills the rest oldest-first
    assert {
        "d04_simhash", "d07_dedup_clusters", "e01_tumbling_hourly",
        "e09_asof_join", "s03_near_dup_pairs", "s13_pq_ann",
    } <= window
    # predicted spill: the r10-green tail from t08 onwards
    assert names[50] == "t08_top_bigrams"
    assert names[51] == "t10_cms_heavy_hitters"
    # NO slot burns on r11/r12-green untouched code.
    assert not (window & {
        "x08_split_leakage", "d01_exact_dedup", "q26_intersect",
        "s01_knn_bruteforce", "q01_pricing_summary",
        "m01_image_metadata", "p01_pipeline_month_e2e",
        "d13_duplicate_spans", "e16_stream_replay",
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
