"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose the full operator surface (SURVEY.md §2.2) with
DuckDB oracles. Column aliases match between both sides.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

SF0_001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Star-schema revenue query: filter → broadcast dim joins → hash agg →
    top-k (the q05/q03 shape from SURVEY.md §7 step 1).
    """
    from rfb_data_pipeline_spark.operators.relational import q04_revenue_by_nation

    return q04_revenue_by_nation(spark, SF0_001)


def _registry() -> tuple[dict, dict]:
    from rfb_data_pipeline_spark.operators import (
        dedup,
        events,
        graph,
        media,
        relational,
        sampling,
        similarity,
        text,
    )

    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracle: dict[str, str] = {}
    for mod in (relational, events, dedup, text, similarity, sampling, media, graph):
        queries.update(mod.QUERIES)
        oracle.update(mod.ORACLE)
    # Registry ORDER matters: the driver's correctness harness records
    # only the first 50 entries per round, so the window is rotated
    # explicitly each round (no family unverified two rounds running).
    # History: r1-r2 q/e first; r3 d/t/s/x/m + e01-e04; r4 all 35 q +
    # e01-e14 + e16 (48/50 hash-green, the 2 non-green are rows-only
    # sketches by design).
    #
    # r05 window (executes VERDICT r04 "Next round" items 1, 6, 7):
    #   1-23:  the 23 never-driver-checked r04 entries
    #          (d14-d16, t12-t17, s11-s15, x11-x16, m05, m06, e17);
    #   24:    e18 (NEW r05 — drift-monitor batch replay);
    #   25:    m04 (rows-only; the one entry with no driver record of
    #          any kind);
    #   26-29: d02/d07/d09/d12 — dedup entries whose code or inputs
    #          changed in r05 (shingle df-cap, d15 edge recomposition,
    #          stage_boundary rewiring);
    #   30:    e15 (green r02, code unchanged, yielded its r04 slot);
    #   31-32: e19 (NEW r05 — quality-scoring batch replay, the other
    #          stream named by VERDICT r04 item 6) and x17 (NEW r05 —
    #          cluster-aware curation composing d15 labels + t15
    #          scores);
    #   33-50: r03-green entries oldest-first (d01, d03-d06, d08, d10,
    #          d13, s01-s08) + m07/m08 (NEW r05 — ID3v1 fixed-offset
    #          tag parse and RIFF/WAV little-endian header parse, the
    #          media family's third and fourth hash rows) —
    #          t01/t02/s09/s10 yield their slots to the four new
    #          queries and head the r06 spill.
    # Spill to r06 (code unchanged since r03 green rows): t01-t11,
    # x01-x10, s09, s10; then the r04-green q/e series and rows-only
    # m01-m03.
    # All 139 entries pass tools/check_oracle.py at sf0.01 AND sf0.1
    # this round (full gate — recorded in COVERAGE.md).
    #
    # Round 6 rotation plan (write it before you need it). The r05
    # second session's exactround conversion TOUCHED these spill
    # entries after their last driver row: q01 q03 q04 q05 q06 q14
    # q15 q16 q18 q29 q34 q35, e12, t01 t02 t07 t09 t16, x01 — their
    # r03/r04 rows predate the current code, so they are first-class
    # r06 promotions alongside the never-promoted spill. r06 window:
    #   1-13:  d17 d18 d19 d20 + g01-g06 + e20 e21 + t18
    #          (r05-late span-ACTION tier, graph family, EWMA,
    #          transition matrix, posting lists — the only entries
    #          with NO driver row of any kind);
    #   14-36: t01-t11, x01-x10, s09, s10 (oldest rows;
    #          t01/t02/t07/t09/t16/x01 are ALSO exactround-touched);
    #   37-49: the touched q-series (q01 q03-q06 q14-q16 q18 q29 q34
    #          q35) + e12;
    #   50:    m01 (rows-only, oldest media row; m02/m03 + remaining
    #          q/e overflow to r07, where the rest of the r04-green
    #          q/e series rotates). After r06+r07 every entry has a
    #          driver row that postdates its current code.
    r05_window = [
        "d14_dup_span_fraction", "d15_cc_star", "d16_incremental_minhash",
        "t12_zipf_slope", "t13_pii_redaction", "t14_bigram_surprisal",
        "t15_quality_classifier", "t16_html_extract", "t17_url_filter",
        "s11_batch_knn", "s12_embedding_outliers", "s13_pq_ann",
        "s14_embedding_validation", "s15_ivf_pq_ann",
        "x11_curriculum_buckets", "x12_repetition_gate",
        "x13_weighted_sample", "x14_epoch_plan", "x15_split_drift",
        "x16_quality_mixture", "m05_header_parse", "m06_subtitle_parse",
        "e17_multistep_funnel",
        "e18_drift_replay",
        "m04_audio_frames",
        "d02_ngram_jaccard", "d07_dedup_clusters", "d09_containment",
        "d12_minhash_calibration",
        "e15_gap_fill_locf",
        "e19_quality_replay", "x17_cluster_curation",
        "d01_exact_dedup", "d03_minhash_lsh", "d04_simhash",
        "d05_simhash_pairs", "d06_incremental_dedup", "d08_decontaminate",
        "d10_fuzzy_pairs", "d13_duplicate_spans",
        "s01_knn_bruteforce", "s02_ann_lsh", "s03_near_dup_pairs",
        "s04_label_centroids", "s05_ann_ivf", "s06_near_dup_pairs_banded",
        "s07_quantized_knn", "s08_kmeans_lloyd",
        "m07_id3_tag_parse", "m08_wav_header_parse",
    ]
    spill = (
        [f"t{i:02d}" for i in range(1, 12)]
        + [f"x{i:02d}" for i in range(1, 11)]
        + ["s09_vector_stats", "s10_semantic_dedup",
           # NEW r05 late (13 entries) — r06 promotes them all
           "d17_span_dedup_action", "d18_cleaned_corpus",
           "d19_decontaminate_action", "d20_incremental_span_dedup",
           "g01_item_pagerank", "g02_item_triangles", "g03_bfs_hops",
           "e20_ewma_baseline", "t18_posting_lists",
           "e21_transition_matrix", "g04_item_similarity",
           "g05_graph_summary", "g06_lpa_communities"]
        + [n for n in queries if n.startswith("q")]
        + [n for n in queries if n.startswith("e")]
        + ["m01_image_metadata", "m02_media_stats", "m03_frame_sample"]
    )

    def _expand(prefix_or_name: str) -> str:
        if prefix_or_name in queries:
            return prefix_or_name
        matches = [n for n in queries if n.startswith(prefix_or_name + "_")]
        assert len(matches) == 1, (prefix_or_name, matches)
        return matches[0]

    order: list[str] = []
    for item in r05_window + spill:
        name = _expand(item)
        if name not in order:
            order.append(name)
    assert len(order) == len(queries) and set(order) == set(queries), (
        sorted(set(queries) - set(order)),
        sorted(set(order) - set(queries)),
    )
    queries = {n: queries[n] for n in order}
    oracle = {n: oracle[n] for n in order if n in oracle}
    return queries, oracle


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _registry()[0]


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle for each SQL-expressible query."""
    return _registry()[1]
