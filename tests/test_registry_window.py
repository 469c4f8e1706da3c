"""Registry-window guard: the driver records CORRECTNESS for only the
first 50 ``queries()`` entries, so their composition is load-bearing —
an innocent dict reorder could silently rotate a never-verified query
out of (or a stale one into) the round's window.

Since r06 the order is COMPUTED from the rotation ledger
(rfb_data_pipeline_spark/rotation.py): never-driver-checked first,
then touched-since-their-row, then green oldest-first. These tests pin
the r14 composition the ledger must produce AND the ledger's own
freshness invariants, so a ledger edit that starves an entry fails
loudly.
"""

from __future__ import annotations

import __spark_entry__ as entry_mod
from rfb_data_pipeline_spark import rotation


def _names():
    return list(entry_mod.queries())


# Rows whose r13 code change was committed AFTER the r13 ledger update
# (VERDICT r13 item 2): their newest driver row predates the executed
# code, so they MUST lead the r14 window. Ordered by the tier-1 key
# (driver row asc, then name): t10/t11/t19/x05 have r10 rows, e18 an
# r11 row, t05/t06 r12 rows.
R13_LEDGER_GAP = (
    "t10_cms_heavy_hitters", "t11_unigram_surprisal", "t19_bm25_search",
    "x05_corpus_curation", "e18_drift_replay", "t05_top_terms",
    "t06_tfidf_top_terms",
)

# Rows whose executed code changes in r14 (this optimization round).
# Extend together with rotation.LAST_TOUCHED[...] = 14 as each change
# lands.
R14_TOUCHED: tuple[str, ...] = (
    "d10_fuzzy_pairs",          # driver row r11
    "e17_multistep_funnel",     # driver row r11
    "e22_any_click_funnel",     # driver row r12
    "g07_edge_stream_replay",   # driver row r12
    "s08_kmeans_lloyd",         # driver row r11
    "s11_batch_knn",            # driver row r12
    "e03_sessionize",           # driver row r13
    "s06_near_dup_pairs_banded",  # driver row r13
    "s13_pq_ann",               # driver row r13
    "s15_ivf_pq_ann",           # driver row r13
    "x16_quality_mixture",      # driver row r13
)


def test_r14_window_composition():
    names = _names()
    window = set(names[:50])
    # Tier 0 — never driver-checked: EMPTY since the r10 fold (p01 was
    # the last never-checked entry; the registry is at its 150 cap).
    never_checked = {n for n in names if n not in rotation.LAST_DRIVER_ROW}
    assert never_checked == set()
    # Tier 1 — rows predating this round's code: exactly the r13
    # ledger-gap rows plus this round's touches; every one fits in the
    # window (the driver's oracle covers every changed row next run).
    touched_stale = {
        n
        for n in names
        if rotation.LAST_TOUCHED.get(n, 0)
        > rotation.LAST_DRIVER_ROW.get(n, 99)
    }
    assert touched_stale == set(R13_LEDGER_GAP) | set(R14_TOUCHED)
    assert touched_stale <= window
    # Tier-1 entries are ordered by (driver row, name) — the stalest
    # evidence is re-checked first.
    tier1 = names[: len(touched_stale)]
    assert set(tier1) == touched_stale
    keys = [(rotation.LAST_DRIVER_ROW[n], n) for n in tier1]
    assert keys == sorted(keys)
    # the green tier fills the rest oldest-first: the r10-green block
    # (t08/t14/t18/x01-x07 tail) must all be inside
    assert {
        "t08_top_bigrams", "t14_bigram_surprisal", "t18_posting_lists",
        "x01_split_assign", "x06_shuffle_shard", "x07_upsert_merge",
        "d01_exact_dedup", "d06_incremental_dedup",
    } <= window
    # NO slot burns on r12/r13-green untouched code.
    assert not (window & {
        "q01_pricing_summary", "q24_approx_distinct",
        "m01_image_metadata", "m09_jpeg_roundtrip",
        "d13_duplicate_spans", "e16_stream_replay",
        "d02_ngram_jaccard", "g01_item_pagerank",
        "x17_cluster_curation",
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
