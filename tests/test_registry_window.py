"""Registry-window guard: the driver records CORRECTNESS for only the
first 50 ``queries()`` entries, so their composition is load-bearing —
an innocent dict reorder could silently rotate a never-verified query
out of (or a stale one into) the round's window.

Since r06 the order is COMPUTED from the rotation ledger
(rfb_data_pipeline_spark/rotation.py): never-driver-checked first,
then touched-since-their-row, then green oldest-first. These tests pin
the r10 composition the ledger must produce AND the ledger's own
freshness invariants, so a ledger edit that starves an entry fails
loudly.
"""

from __future__ import annotations

import __spark_entry__ as entry_mod
from rfb_data_pipeline_spark import rotation


def _names():
    return list(entry_mod.queries())


# The r06-stale tail the r09 verdict flagged: their newest driver rows
# are r06 (== CURRENT_ROUND - 4 at r10), so the freshness invariant
# FORCES them into the r10 window — the round's primary rotation goal.
R06_STALE = {
    "t10_cms_heavy_hitters", "t11_unigram_surprisal", "t19_bm25_search",
    "x01_split_assign", "x02_cap_per_group", "x03_stratified_sample",
    "x04_chunk_documents", "x05_corpus_curation",
}


def test_r10_window_composition():
    names = _names()
    window = set(names[:50])
    # Tier 0 — never driver-checked: the end-to-end RFB pipeline row
    # (VERDICT r09 item 2, the registry's 150th slot).
    never_checked = {n for n in names if n not in rotation.LAST_DRIVER_ROW}
    assert never_checked == {"p01_pipeline_month_e2e"}
    # Tier 1 — rows predating this round's code (r10 touches): the
    # jpeg ZRL guard tightened to k >= 64 (ADVICE r09), executed by
    # both codec rows.
    touched_stale = {
        n
        for n in names
        if rotation.LAST_TOUCHED.get(n, 0)
        > rotation.LAST_DRIVER_ROW.get(n, 99)
    }
    assert touched_stale == {"m09_jpeg_roundtrip", "m10_mjpeg_frames"}
    # The forced r06 tail all seat, right after the tier-0/1 entries.
    assert R06_STALE <= window
    assert set(names[: 3 + len(R06_STALE)]) == (
        never_checked | touched_stale | R06_STALE
    )
    # Next-oldest green (r07 rows) fill the remaining 39 slots; the
    # youngest-named r07 entries spill to positions 50-52.
    assert {
        "d02_ngram_jaccard", "e01_tumbling_hourly", "g05_graph_summary",
        "v01_integrity_report", "x06_shuffle_shard",
    } <= window
    assert names[50] == "x08_split_leakage"
    assert names[51] == "x09_pack_sequences"
    assert names[52] == "x10_domain_mixture"
    # NO slot burns on r08/r09-green untouched code.
    assert not (window & {
        "v02_duplicate_keys_report", "q24_approx_distinct",
        "m01_image_metadata", "m05_header_parse",
        "d01_exact_dedup", "s02_ann_lsh", "s16_ann_recall_verdict",
        "q25_collect_set", "t01_token_stats", "e16_stream_replay",
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
