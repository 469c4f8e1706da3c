"""Plan-shape regression tests: the scale contract as assertions.

These pin the physical properties that make the engine viable at
100 TB — if a refactor drops a pushdown, un-broadcasts a dimension,
or sneaks a Python eval into the hot path, these fail even though
results stay correct.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from rfb_data_pipeline_spark.plans import inspect as pi
from tests.conftest import SF_SMALL

_QUERIES = entry_mod.queries()


def _q(spark, name):
    return _QUERIES[name](spark, SF_SMALL)


def test_q01_filter_pushed_and_pruned(spark):
    df = _q(spark, "q01_pricing_summary")
    pushed = " ".join(pi.pushed_filters(df))
    assert "l_shipdate" in pushed  # predicate reached the parquet scan
    schemas = " ".join(pi.read_schemas(df))
    assert "l_comment" not in schemas
    # only needed columns read
    assert "l_partkey" not in schemas and "l_suppkey" not in schemas


def test_q03_topk_no_global_sort(spark):
    df = _q(spark, "q03_topk_revenue")
    assert pi.uses_take_ordered(df)  # limit+orderBy → TakeOrdered
    pushed = " ".join(pi.pushed_filters(df))
    assert "c_mktsegment" in pushed and "o_orderdate" in pushed


def test_q05_dimensions_broadcast(spark):
    df = _q(spark, "q05_region_revenue")
    assert pi.uses_broadcast_join(df)
    # region filter is pushed into its scan, before the join
    assert any("r_name" in p for p in pi.pushed_filters(df))


def test_q06_single_codegen_scan(spark):
    df = _q(spark, "q06_forecast_revenue")
    pushed = " ".join(pi.pushed_filters(df))
    assert "l_shipdate" in pushed and "l_discount" in pushed
    # scan reads only the 4 referenced columns
    schemas = pi.read_schemas(df)
    assert len(schemas) == 1
    assert schemas[0].count(":") == 4


def test_no_python_eval_in_query_surface(spark):
    """No row-at-a-time Python anywhere in the declared queries."""
    for name in sorted(_QUERIES):
        assert not pi.has_python_eval(_QUERIES[name](spark, SF_SMALL)), name


def test_q09_single_shuffle_window(spark):
    # top-k per group: one shuffle for the join + one for the window,
    # nothing quadratic
    df = _q(spark, "q09_topk_per_group")
    assert pi.n_exchanges(df) <= 3


def test_rank_filters_get_window_group_limit(spark):
    """rank<=k / row_number<=k filters must push a map-side
    WindowGroupLimit (Partial) below the shuffle: each task keeps only
    its local top-k per group, so the per-nation window partition never
    materializes the full group even when groups grow linearly with the
    table (the r02 VERDICT q21 concern — at 100 TB a nation's suppliers
    are millions of rows, but each map task still ships at most k)."""
    for name in ("q21_rank_suppliers", "q09_topk_per_group", "s11_batch_knn"):
        plan = pi.explain_string(_q(spark, name), "simple")
        assert "WindowGroupLimit" in plan, name
        assert "Partial" in plan.split("WindowGroupLimit", 1)[1], name


def test_partition_pruning_on_month_layout(spark, tmp_path):
    """The RFB month-partitioned layout must prune at the scan: a
    filter on the partition column reads only that partition's files
    (the 100 TB reason the month is a partition VALUE, not a schema
    name — SURVEY §1.3)."""
    from pyspark.sql import functions as F

    from rfb_data_pipeline_spark.catalog import load_tables

    orders = load_tables(spark, SF_SMALL, tables=("orders",), register_views=False)[
        "orders"
    ]
    out = str(tmp_path / "orders_by_year")
    (
        orders.withColumn("yr", F.year("o_orderdate"))
        .write.partitionBy("yr")
        .parquet(out)
    )
    pruned = spark.read.parquet(out).filter(F.col("yr") == 1995)
    plan = pi.explain_string(pruned)
    assert "PartitionFilters: [isnotnull(yr" in plan or "yr#" in (
        plan.split("PartitionFilters:")[1].split("]")[0]
    )
    # only the yr=1995 directory is scanned
    n_95 = pruned.count()
    assert n_95 == orders.filter(F.year("o_orderdate") == 1995).count()


def test_s01_query_vector_broadcast(spark):
    df = _q(spark, "s01_knn_bruteforce")
    assert pi.uses_broadcast_join(df) or "BroadcastNestedLoopJoin" in (
        pi.explain_string(df, "simple")
    )
    assert pi.uses_take_ordered(df)


def test_d05_simhash_pairs_no_cartesian(spark):
    """d05's candidate generation must be the byte-pigeonhole equi-join,
    never an all-pairs cartesian (the round-1 scale-killer)."""
    plan = pi.explain_string(_q(spark, "d05_simhash_pairs"), mode="simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_s06_banded_pairs_no_cartesian(spark):
    """s06 joins within LSH buckets — equi-join only; the all-pairs
    form is s03, which exists solely as the exactness oracle."""
    plan = pi.explain_string(_q(spark, "s06_near_dup_pairs_banded"), mode="simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_d09_containment_no_cartesian(spark):
    """d09 pairs come from the inverted shingle index (equi-join on the
    shingle), never an all-pairs comparison."""
    plan = pi.explain_string(_q(spark, "d09_containment"), mode="simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_x05_curation_broadcasts_eval_set(spark):
    """The decontamination stage must broadcast the (small) benchmark
    shingle set — a shuffled semi-join here would re-shuffle the whole
    corpus shingle table at 100 TB."""
    df = _q(spark, "x05_corpus_curation")
    plan = pi.explain_string(df, mode="simple")
    assert "CartesianProduct" not in plan
    assert pi.uses_broadcast_join(df)


def test_x06_shard_single_wide_shuffle(spark):
    """Shuffle-shard export: one shuffle for the shard window, one for
    the final aggregate — no extra exchanges, no global single-
    partition sort (the reason shard assignment is hash-based)."""
    df = _q(spark, "x06_shuffle_shard")
    assert pi.n_exchanges(df) <= 2
    plan = pi.explain_string(df, mode="simple")
    # a global ORDER BY would appear as a range-partitioned Sort
    assert "rangepartitioning" not in plan.lower()


def test_dynamic_partition_pruning_fact_dim_join(spark, tmp_path):
    """A selective dim-side filter must prune fact PARTITIONS at
    runtime (DPP): the fact scan's PartitionFilters carry a
    dynamicpruning subquery fed by the dim join keys, so at 100 TB a
    date/tenant-partitioned fact reads only the partitions the dim
    actually selects — not the whole table."""
    from pyspark.sql import functions as F

    from rfb_data_pipeline_spark.catalog import load_tables

    t = load_tables(
        spark, SF_SMALL, tables=("orders", "customer"), register_views=False
    )
    out = str(tmp_path / "orders_by_ck")
    t["orders"].withColumn("ck", F.col("o_custkey") % 64).write.partitionBy(
        "ck"
    ).parquet(out)
    fact = spark.read.parquet(out)
    dim = (
        t["customer"]
        .filter(F.col("c_custkey") < 20)
        .select((F.col("c_custkey") % 64).alias("ck"))
        .distinct()
    )
    joined = fact.join(dim, "ck").agg(F.sum("o_totalprice").alias("s"))
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()


def test_d10_candidate_join_no_cartesian(spark):
    """d10's edit-distance candidate generation must stay an EQUI-join
    on (gram, band) — a regression to an all-pairs/cartesian shape is
    the 100 TB failure mode the banding exists to prevent."""
    df = _q(spark, "d10_fuzzy_pairs")
    plan = pi.explain_string(df, "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert not pi.has_python_eval(df)


def test_q34_bounds_broadcast_one_row(spark):
    """q34 joins the fact against a 1-row min/max aggregate: that must
    be a broadcast (nested-loop against a single-row build side), never
    a shuffle of the fact table keyed on a constant."""
    df = _q(spark, "q34_histogram")
    plan = pi.explain_string(df, "simple")
    assert "BroadcastNestedLoopJoin" in plan or pi.uses_broadcast_join(df)
    assert "CartesianProduct" not in plan


def test_s09_vector_stats_zero_shuffle(spark):
    """s09 is pure per-row lambda math: the plan must contain NO
    exchange and NO Python eval — it scales with input splits alone."""
    df = _q(spark, "s09_vector_stats")
    assert pi.n_exchanges(df) == 0
    assert not pi.has_python_eval(df)


def test_x09_no_corpus_wide_single_partition_window(spark):
    """x09's running token sum must be the two-phase banded prefix sum:
    the corpus-scale window is PARTITIONED by the skey band, and the
    only single-partition exchange in the plan is the 256-row
    band-totals frame (the r02 VERDICT scale-killer, fixed)."""
    import re as _re

    df = _q(spark, "x09_pack_sequences")
    plan = pi.explain_string(df, "simple")
    # corpus window keyed on band, not global
    assert _re.search(r"windowspecdefinition\(band#\d+, skey#", plan)
    # exactly one SinglePartition exchange: the tiny band-offset frame
    assert plan.count("Exchange SinglePartition") == 1


def test_q29_no_corpus_wide_single_partition_window(spark):
    """q29's global rank is the banded two-phase form: the table-scale
    window is PARTITIONED by the value-range band; only constant-size
    frames (1-row min/max bounds, |bands|-row offsets) may pass through
    a single partition (r02 VERDICT item 4)."""
    import re as _re

    df = _q(spark, "q29_ntile_percentile")
    plan = pi.explain_string(df, "simple")
    # table-scale window keyed on the band, not bare orderBy
    assert _re.search(r"windowspecdefinition\(_band#\d+L?, s_acctbal#", plan)
    # single-partition exchanges limited to the tiny helper frames
    assert plan.count("Exchange SinglePartition") <= 3


def test_s13_adc_join_is_broadcast(spark):
    """s13's ADC scoring joins the corpus codes against the
    (PQ_M × K_PQ)-entry distance table: that must be a broadcast —
    shuffling the code table on (m, code) would move the whole corpus
    for a 32-row build side."""
    df = _q(spark, "s13_pq_ann")
    plan = pi.explain_string(df, "simple")
    assert pi.uses_broadcast_join(df)
    assert "CartesianProduct" not in plan
    assert not pi.has_python_eval(df)


def test_t16_t17_pure_map_no_exchange_before_agg(spark):
    """t16 is a per-row regexp chain (zero exchanges); t17 is the same
    plus one per-source aggregate (exactly its two agg exchanges at
    most)."""
    t16 = _q(spark, "t16_html_extract")
    assert pi.n_exchanges(t16) == 0
    assert not pi.has_python_eval(t16)
    t17 = _q(spark, "t17_url_filter")
    assert pi.n_exchanges(t17) <= 1  # the groupBy(source) shuffle
    assert not pi.has_python_eval(t17)


def test_d15_round_frames_stay_narrow(spark):
    """d15's output plan (post-fixpoint) must not contain a cartesian
    or nested-loop join — every star round is equi-join/groupBy."""
    df = _q(spark, "d15_cc_star")
    plan = pi.explain_string(df, "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert not pi.has_python_eval(df)
    # r05 recomposition: edges must come from d03's banded candidate
    # generation, never d02's exact tier — no join in the plan may be
    # keyed on the shingle column ALONE (that is the all-pairs
    # inverted-index join's signature; d03's joins key on
    # (band_idx, bucket) or (doc_id, shingle)).
    import re

    assert not re.search(r"\[shingle#\d+\], \[shingle#\d+\]", plan), (
        "d15 plan contains a shingle-only-keyed join (exact all-pairs tier)"
    )


# Queries whose plan legitimately funnels through a single partition:
# every entry is a constant-size or calendar-bounded frame, never a
# row-count-scaled table. Anything NOT listed here that grows a
# SinglePartition exchange is a scale regression.
_SINGLE_PARTITION_OK = {
    "q06_forecast_revenue",  # 1-row global aggregate
    "q10_monthly_lag",  # post-agg month frame (calendar-bounded)
    "q12_set_ops",  # 1-row count over EXCEPT
    "q20_running_total",  # post-agg day frame (calendar-bounded)
    "q25_collect_set",  # broadcast-side 1-row frame
    "q26_intersect",  # 1-row count
    "q29_ntile_percentile",  # 1-row bounds + 32-row band offsets
    "q30_moving_range_sum",  # post-agg day frame
    "q33_approx_quantiles",  # constant-size sketch merge
    "q34_histogram",  # 1-row bounds frame
    "e02_sliding_window",  # post-agg minute grid (calendar-bounded)
    "e05_funnel",  # 1-row funnel summary
    "e11_spike_detection",  # post-agg minute frame
    "e12_sequence_match",  # 1-row match count
    "e17_multistep_funnel",  # 1-row funnel summary
    "e22_any_click_funnel",  # 1-row funnel summary (e17 shape)
    "e14_max_concurrency",  # banded prefix sum's band-offset frame
    "e15_gap_fill_locf",  # calendar-bounded resample grid
    "d01_exact_dedup",  # 1-row dedup summary
    "g05_graph_summary",  # 1-row graph health card (cc_star fixpoint frames)
    "m01_image_metadata",  # per-size-class summary over a 96-row media table
    "m02_media_stats",  # 2-row per-kind decode summary
    "m09_jpeg_roundtrip",  # 2-row verdict over a 24-image codec sweep
    "v01_integrity_report",  # 4-row violation report (1-row v4 rollup)
    "v02_duplicate_keys_report",  # 1-row dup-keys + count-gate report
    "d12_minhash_calibration",  # 1-row calibration summary
    "d13_duplicate_spans",  # 1-row span-dedup summary
    "t06_tfidf_top_terms",  # 1-row corpus doc-count frame (IDF side)
    "t08_top_bigrams",  # top-k limit frame
    "s13_pq_ann",  # 10-row top-k limit frame joining labels (the
    # memoized codes boundary turns TakeOrdered into sort+limit)
    "t10_cms_heavy_hitters",  # constant-size sketch
    "t11_unigram_surprisal",  # 1-row corpus token-total frame
    "t19_bm25_search",  # 1-row corpus totals frame (N, avgdl side)
    "s08_kmeans_lloyd2",  # k-row centroid frames
    "s09_vector_stats",  # 1-row stats summary
    "x03_stratified_sample",  # per-stratum rate frame (|groups| rows)
    "x09_pack_sequences",  # banded prefix sum's band-offset frame
    "x10_domain_mixture",  # 1-row t_max frame + |langs|-row quota frame
    "x11_curriculum_buckets",  # 1-row bounds + 32-row band offsets (q29 shape)
    "t12_zipf_slope",  # rank/regression over the constant 40-row head
    "t15_quality_classifier",  # 1-row vocab-totals + 1-row prior frames
    "x14_epoch_plan",  # 1-row corpus-token-total frame
    "x15_split_drift",  # 1-row totals frame + 1-row KL output
    "e18_drift_replay",  # 1-row totals frame + 1-row KL output (x15 shape)
    "e19_quality_replay",  # nb model's 1-row totals/prior frames (t15 shape)
    "s14_embedding_validation",  # 1-row validation summary
    "x16_quality_mixture",  # t15's 1-row model frames + 1-row t_max
    "s16_ann_recall_verdict",  # 1-row recall audit over the Q-row panel
}


def test_no_cartesian_and_single_partition_whitelist(spark):
    """Belt-and-braces over the WHOLE query surface: no plan may
    contain a cartesian product, and a SinglePartition exchange may
    appear only in whitelisted queries where the funneled frame is
    constant-size or calendar-bounded (r02 VERDICT item 7)."""
    offenders_cartesian = []
    offenders_single = []
    for name in sorted(_QUERIES):
        plan = pi.explain_string(_QUERIES[name](spark, SF_SMALL), "simple")
        if "CartesianProduct" in plan:
            offenders_cartesian.append(name)
        if (
            "Exchange SinglePartition" in plan
            and name not in _SINGLE_PARTITION_OK
        ):
            offenders_single.append(name)
    assert not offenders_cartesian, offenders_cartesian
    assert not offenders_single, offenders_single


def test_exchange_budgets_headline(spark):
    """Shuffle-count budget per flagship query: a refactor that adds
    an exchange (lost broadcast, lost partial-agg, gratuitous
    repartition) fails HERE even while results stay correct. Budgets
    are ceilings (AQE may remove exchanges, never add them)."""
    budgets = {
        "q01_pricing_summary": 1,  # one agg shuffle
        "q05_region_revenue": 1,  # dims broadcast; one agg shuffle
        "e01_tumbling_hourly": 1,  # one (window, type) agg shuffle
        "d01_exact_dedup": 2,  # fingerprint agg + global summary
        "t09_bpe_token_count": 0,  # pure map
        "s09_vector_stats": 0,  # pure map
        "x09_pack_sequences": 4,  # band window + band-totals agg +
        # 256-row offset frame + final pack agg (banded prefix sum)
        "q34_histogram": 2,  # 1-row bounds agg + bin agg
        "q04_revenue_by_nation": 3,  # partial-agg + join + final agg
        "s11_batch_knn": 1,  # broadcast batch; one window shuffle on qid
        "t12_zipf_slope": 1,  # one term-freq agg; head rank is post-limit
        "d14_dup_span_fraction": 4,  # span aggs + dup semi-join + per-doc join
        "x11_curriculum_buckets": 6,  # banded rank (q29 shape) + final agg
        "x12_repetition_gate": 8,  # d14's span aggs/semi-join + t07's
        # token/bigram aggs + doc-keyed joins + per-source agg
        "s12_embedding_outliers": 6,  # dim-explode centroid agg + dim
        # join + per-vec reduce + label moments (stats broadcast back)
        "d17_span_dedup_action": 3,  # span-hash window + doc window +
        # island agg reusing doc_id partitioning (single chain — the
        # folded-occ form; a second window branch would exceed this)
        "d18_cleaned_corpus": 3,  # d17's chain; reconstruction joins
        # the per-doc interval array by broadcast (zero extra shuffle)
        "d19_decontaminate_action": 4,  # span marks (eval side
        # broadcast) + island merge + per-doc cov + source rollup
        "g05_graph_summary": 19,  # the headline graph composition:
        # oriented-triangle chain + four broadcast scalar joins over
        # the shared materialized engagement base (cc_star's per-round
        # shuffles sit behind stage boundaries, not in this plan);
        # a lost broadcast or an unshared engagement base exceeds this
        "g07_edge_stream_replay": 38,  # 4 replay batches x (touched
        # semi-join + old/new aggs + cap windows + pair joins) + final
        # delta sum — the K-batch maintenance cost, linear in K. r07:
        # the folded state skips the per-batch old_per re-agg BOUNDARY
        # (old_aggregated=True), so the old-side chains are now VISIBLE
        # in this plan instead of truncated behind localCheckpoints —
        # same shuffles, ~1s less wall (fewer eager actions); the
        # budget counts what the plan shows
        "e22_any_click_funnel": 3,  # user window + per-view agg +
        # global rollup (clicks side broadcast off the same window)
        "e23_cusum_changepoint": 2,  # hourly rollup + per-type window
        # chain reusing the same partitioning; spine joins broadcast
        "t19_bm25_search": 7,  # token-pass aggs (dl/tf/df/totals) +
        # doc-keyed join + final per-doc agg; df and totals broadcast
        "v01_integrity_report": 5,  # v2 + v3 global aggs (1 each) +
        # v4 dim-distinct (25 rows) + orphan groupBy + 1-row rollup;
        # the anti-join itself is broadcast (zero exchange) — a lost
        # broadcast on the dim side exceeds this
        "v02_duplicate_keys_report": 3,  # dup-key groupBy + 1-row
        # rollup + fixture count; the count frame joins broadcast
        "q36_snapshot_diff": 4,  # two keyed payload-hash aggs + ONE
        # full-outer equi-join + change rollup — no exceptAll double
        # scan, no row payload through the shuffle
        "e20_ewma_baseline": 4,  # hourly rollup + spine fill + the
        # integer-unit recursive window chain on one partitioning
        "e21_transition_matrix": 3,  # per-user ordered window + pair
        # agg + per-state totals (broadcast back)
        "t18_posting_lists": 2,  # one term agg off the shared token
        # stream + the per-(term, doc) posting agg; top-k is
        # post-limit, never a global sort
    }
    over = {}
    for name, budget in budgets.items():
        n = pi.n_exchanges(_q(spark, name))
        if n > budget:
            over[name] = (n, budget)
    assert not over, f"exchange budget exceeded (got, budget): {over}"


def test_runtime_bloom_filter_injects_on_shuffle_join(spark):
    """100 TB runtime-filtering path: when a fact x fact shuffle join
    has a selective filter on one side, Catalyst injects a runtime
    bloom filter (might_contain) into the other side's scan, cutting
    shuffled fact bytes before the exchange. Size thresholds are
    lowered here because testdata is tiny; at cluster scale the
    defaults (10 MB creation / 10 GB application) trigger on exactly
    this plan shape — the point pinned is that OUR join plans are
    eligible (selective creation side, plain equi-join, no
    broadcast)."""
    import pyspark.sql.functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    old = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        orders = spark.read.parquet(SF_SMALL + "/orders.parquet")
        li = spark.read.parquet(SF_SMALL + "/lineitem.parquet")
        j = li.join(
            orders.filter(F.col("o_orderpriority") == "1-URGENT"),
            li.l_orderkey == orders.o_orderkey,
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan or "might_contain" in plan, plan
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_s16_panel_scorer_runs_once(spark):
    """The Q×N Arrow panel scorer must be materialized ONCE behind the
    stage boundary — if it leaks back into the lazy plan, both the
    exact and ANN tiers inline it and the corpus is scored twice (the
    double-pass the round-9 review caught). The only Arrow node in the
    final plan is the candidate-probe bucket UDF."""
    plan = pi.explain_string(_q(spark, "s16_ann_recall_verdict"), "simple")
    assert "panel_cos" not in plan, "scorer leaked into the lazy plan"
    assert plan.count("ArrowEvalPython") <= 1, plan.count("ArrowEvalPython")
