"""Operator linearity check (VERDICT r03 item 4): wall time and
shuffle bytes vs corpus size for the scale-critical document
operators.

Builds 1x/3x/10x document fixtures from sf0.1 (replica k suffixes
every token with ``_k``, so replicas share no shingles/spans with
each other — the within-replica duplicate structure is preserved and
total work is exactly multiplied), then times each checked operator
and reports wall seconds plus total shuffle-write bytes from the
Spark REST status API. Linear growth in both confirms the banded /
fingerprint designs carry no hidden all-pairs blowup.

Usage: python tools/scale_check.py [--ops=d13,d03,x09,t11] [mults...]
(defaults: ops d13, mults 1 3 10). One JSON line per (op, mult).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

BASE = "/root/testdata/sf0.1/documents.parquet"
FIXTURES = "/tmp/spark_graft_scale_fixtures"


def _fixture_dir(mult: int) -> str:
    return os.path.join(FIXTURES, f"x{mult}")


def build_embeddings_fixture(spark, mult: int) -> None:
    """Replica k multiplies every vector elementwise by a k-seeded ±1
    sign pattern: within-replica cosines are EXACTLY preserved
    (cos(s⊙a, s⊙b) == cos(a, b)), while cross-replica vectors
    decorrelate — so pair/cell structure multiplies cleanly."""
    from pyspark.sql import functions as F

    dest = os.path.join(_fixture_dir(mult), "embeddings.parquet")
    if os.path.exists(dest):
        return
    base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    n = base.agg(F.max("vec_id")).collect()[0][0] + 1
    nl = base.agg(F.max("label")).collect()[0][0] + 1
    reps = []
    for k in range(mult):
        # pmod, not %: Spark remainder keeps the dividend's sign, so
        # odd NEGATIVE hashes would give -1*2-1 = -3 (a 3x-scaled dim,
        # breaking the cosine-preservation invariant). pmod(h, 2) is
        # always {0, 1} (the skew.py idiom).
        signed = F.transform(
            "embedding",
            lambda x, i: x
            * (F.pmod(F.xxhash64(F.lit(k), i), F.lit(2)) * 2 - 1).cast(
                "float"
            ),
        )
        reps.append(
            base.select(
                (F.col("vec_id") + F.lit(k * n)).alias("vec_id"),
                signed.alias("embedding"),
                (F.col("label") + F.lit(k * nl)).alias("label"),
            )
        )
    df = reps[0]
    for r in reps[1:]:
        df = df.unionByName(r)
    df.repartition(32).write.mode("overwrite").parquet(dest)


def build_orders_fixture(spark, mult: int) -> None:
    """Replica k shifts o_orderkey by k*n: p01's fixture MONTH grows
    linearly in company lines (one CSV line per order key, plus the
    %31 re-load slice) while nation — the v4 referential dimension —
    stays fixed: the realistic growth axis for the RFB monthly drop
    (more CNPJs, same natureza-code catalog). Keys stay well under
    the 1e8 injectivity guard (sf0.1 max ~6e5; 10x shift ~6e6)."""
    from pyspark.sql import functions as F

    out = _fixture_dir(mult)
    dest = os.path.join(out, "orders.parquet")
    if os.path.exists(dest):
        return
    base = spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
    n = base.agg(F.max("o_orderkey")).collect()[0][0] + 1
    others = [c for c in base.columns if c != "o_orderkey"]
    reps = [
        base.select(
            (F.col("o_orderkey") + F.lit(k * n)).alias("o_orderkey"), *others
        )
        for k in range(mult)
    ]
    df = reps[0]
    for r in reps[1:]:
        df = df.unionByName(r)
    df.repartition(32).write.mode("overwrite").parquet(dest)
    # the dimension does NOT replicate (fixed natureza catalog)
    nat_dest = os.path.join(out, "nation.parquet")
    if not os.path.exists(nat_dest):
        spark.read.parquet(
            "/root/testdata/sf0.1/nation.parquet"
        ).coalesce(1).write.mode("overwrite").parquet(nat_dest)


def build_events_fixture(spark, mult: int) -> None:
    """Replica k shifts user_id/event_id by k*max: the USER population
    multiplies while the item catalog (props.k) stays fixed — the
    realistic growth axis for the co-engagement graph ops (g01/g02),
    whose per-user capped pair join must scale with users, not
    items."""
    from pyspark.sql import functions as F

    dest = os.path.join(_fixture_dir(mult), "events.parquet")
    if os.path.exists(dest):
        return
    base = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
    nu = base.agg(F.max("user_id")).collect()[0][0] + 1
    ne = base.agg(F.max("event_id")).collect()[0][0] + 1
    reps = [
        base.select(
            (F.col("event_id") + F.lit(k * ne)).alias("event_id"),
            "ts",
            (F.col("user_id") + F.lit(k * nu)).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        for k in range(mult)
    ]
    df = reps[0]
    for r in reps[1:]:
        df = df.unionByName(r)
    df.repartition(32).write.mode("overwrite").parquet(dest)


def build_events_fixture_items(spark, mult: int) -> str:
    """ITEM-growth variant (r12): the user-replication fixture cannot
    grow the co-engagement graph — the item catalog is fixed, so the
    projection saturates at the complete item graph (measured: 4,950
    edges at every mult). Here replica k ALSO shifts props.k by
    k*n_items, so the graph gains a fresh item block per replica
    (block-diagonal growth: nodes and edges multiply, components
    multiply — the 100 TB regime where the item vocabulary grows with
    the corpus). props is re-serialized as {"k": shifted}; rows with
    NULL/malformed props stay NULL (they never reach the graph).
    Separate fixture dir so the user-axis fixtures stay bit-stable."""
    from pyspark.sql import functions as F

    out = os.path.join(FIXTURES, f"items{mult}")
    dest = os.path.join(out, "events.parquet")
    if os.path.exists(dest):
        return out
    base = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
    nu = base.agg(F.max("user_id")).collect()[0][0] + 1
    ne = base.agg(F.max("event_id")).collect()[0][0] + 1
    item = F.from_json("props", "struct<k:int>").getField("k")
    ni = base.select(F.max(item)).collect()[0][0] + 1
    reps = [
        base.select(
            (F.col("event_id") + F.lit(k * ne)).alias("event_id"),
            "ts",
            (F.col("user_id") + F.lit(k * nu)).alias("user_id"),
            "event_type",
            "value",
            F.when(
                item.isNotNull(),
                F.to_json(F.struct((item + F.lit(k * ni)).alias("k"))),
            ).alias("props"),
        )
        for k in range(mult)
    ]
    df = reps[0]
    for r in reps[1:]:
        df = df.unionByName(r)
    df.repartition(32).write.mode("overwrite").parquet(dest)
    return out


def build_fixture(spark, mult: int) -> str:
    from pyspark.sql import functions as F

    out = _fixture_dir(mult)
    build_embeddings_fixture(spark, mult)
    build_events_fixture(spark, mult)
    dest = os.path.join(out, "documents.parquet")
    if os.path.exists(dest):
        return out
    base = spark.read.parquet(BASE)
    n = base.agg(F.max("doc_id")).collect()[0][0] + 1
    reps = []
    for k in range(mult):
        suffixed = F.array_join(
            F.transform(
                F.split(F.trim(F.col("text")), r"\s+"),
                lambda t: F.concat(t, F.lit(f"_{k}")),
            ),
            " ",
        )
        reps.append(
            base.select(
                (F.col("doc_id") + F.lit(k * n)).alias("doc_id"),
                suffixed.alias("text"),
                "lang",
                "source",
                F.length(suffixed).alias("n_chars"),
            )
        )
    df = reps[0]
    for r in reps[1:]:
        df = df.unionByName(r)
    df.repartition(32).write.mode("overwrite").parquet(dest)
    return out


def _stages(spark) -> list[dict]:
    """Completed-stage metrics for THIS application (ADVICE r07 /
    skew_check pattern: the bound UI URL + applicationId, never a
    hardcoded port + apps[0])."""
    sc = spark.sparkContext
    api = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"
    return json.load(
        urllib.request.urlopen(f"{api}/stages?status=complete", timeout=10)
    )


def shuffle_write_bytes(spark) -> int:
    return sum(s.get("shuffleWriteBytes", 0) for s in _stages(spark))


def input_bytes(spark) -> int:
    return sum(s.get("inputBytes", 0) for s in _stages(spark))


def _ops() -> dict:
    from rfb_data_pipeline_spark.operators.dedup import (
        d03_minhash_lsh,
        d05_simhash_pairs,
        d07_dedup_clusters,
        d10_fuzzy_pairs,
        d13_duplicate_spans,
        d15_cc_star,
        d16_incremental_minhash,
        d17_span_dedup_action,
        d18_cleaned_corpus,
        d19_decontaminate_action,
        d20_incremental_span_dedup,
    )
    from rfb_data_pipeline_spark.operators.events import (
        e19_quality_replay,
        e22_any_click_funnel,
        e23_cusum_changepoint,
    )
    from rfb_data_pipeline_spark.operators.graph import (
        g01_item_pagerank,
        g02_item_triangles,
        g03_bfs_hops,
        g04_item_similarity,
        g05_graph_summary,
        g06_lpa_communities,
        g07_edge_stream_replay,
    )
    from rfb_data_pipeline_spark.operators.sampling import (
        x09_pack_sequences,
        x12_repetition_gate,
        x15_split_drift,
        x17_cluster_curation,
    )
    from rfb_data_pipeline_spark.operators.similarity import (
        s06_near_dup_pairs_banded,
        s10_semantic_dedup,
        s13_pq_ann,
        s15_ivf_pq_ann,
        s16_ann_recall_verdict,
    )
    from rfb_data_pipeline_spark.operators.text import (
        t11_unigram_surprisal,
        t15_quality_classifier,
        t18_posting_lists,
        t19_bm25_search,
    )

    from rfb_data_pipeline_spark.operators.pipeline_e2e import (
        p01_pipeline_month_e2e,
    )

    return {
        "p01": p01_pipeline_month_e2e,
        "d13": d13_duplicate_spans,
        "d03": d03_minhash_lsh,
        "d05": d05_simhash_pairs,
        "d10": d10_fuzzy_pairs,
        "d15": d15_cc_star,
        "d16": d16_incremental_minhash,
        "d17": d17_span_dedup_action,
        "d18": d18_cleaned_corpus,
        "d19": d19_decontaminate_action,
        "d20": d20_incremental_span_dedup,
        "g01": g01_item_pagerank,
        "g02": g02_item_triangles,
        "g03": g03_bfs_hops,
        "g04": g04_item_similarity,
        "g05": g05_graph_summary,
        "g06": g06_lpa_communities,
        "g07": g07_edge_stream_replay,
        "e22": e22_any_click_funnel,
        "e23": e23_cusum_changepoint,
        "t18": t18_posting_lists,
        "t19": t19_bm25_search,
        "d07": d07_dedup_clusters,
        "x09": x09_pack_sequences,
        "x12": x12_repetition_gate,
        "x15": x15_split_drift,
        "x17": x17_cluster_curation,
        "e19": e19_quality_replay,
        "t11": t11_unigram_surprisal,
        "t15": t15_quality_classifier,
        "s06": s06_near_dup_pairs_banded,
        "s10": s10_semantic_dedup,
        "s13": s13_pq_ann,
        "s15": s15_ivf_pq_ann,
        "s16": s16_ann_recall_verdict,
    }


def _force_full_eval(df) -> int:
    """Row count with a checksum over every (non-map) column, NOT a
    bare ``count()``: when an operator's row count is derivable
    without its expensive branch, Catalyst deletes that branch from
    the count plan and the timing is vacuous.  Concretely, d17 emits
    one row per qualifying document via a left join against a
    provably-unique aggregate — ``count()`` eliminated the join and
    the whole span-window chain, timing only the base scan (flat
    1 s / constant 1.9 KB shuffle across 1x/3x/10x).  Summing a hash
    of all output columns makes every branch's values observable, so
    nothing can be pruned."""
    from pyspark.sql import functions as F

    cols = [c for c, t in df.dtypes if not t.startswith("map")]
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        # decimal(38,0) accumulator: summing raw 64-bit hashes ANSI-
        # overflows a long within a handful of rows
        F.sum(
            F.xxhash64(*[F.col(c) for c in cols]).cast("decimal(38,0)")
        ).alias("chk"),
    ).collect()[0]
    return row["n"]


def _tree_stats(path: str) -> tuple[int, int]:
    """(n_files, total_bytes) for every parquet data file under path."""
    files = bytes_total = 0
    for root, _dirs, names in os.walk(path):
        for f in names:
            if f.endswith(".parquet"):
                files += 1
                bytes_total += os.path.getsize(os.path.join(root, f))
    return files, bytes_total


def probe_main(mults: list[int]) -> None:
    """Index-growth probe check (VERDICT r07 item 6): write the
    minhash corpus index over a 1x..Nx corpus and probe it with the
    SAME small batch each time. The recurring-crawl guarantee is that
    probe cost tracks the batch's touched shards, not the index: the
    probe's input bytes must stay a small, shrinking-or-flat fraction
    of the index (a full-scan probe would track index bytes 1:1), and
    files read must grow with per-shard file count only. One JSON
    line per multiplier; shard counts are configs — at 100 TB you
    raise MINHASH_INDEX_SHARDS so per-shard size stays bounded."""
    from pyspark.sql import SparkSession, functions as F

    from rfb_data_pipeline_spark.pipeline.ann_index import (
        probe_minhash_index,
        write_minhash_index,
    )

    boot = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    for m in mults:
        build_fixture(boot, m)
    boot.stop()

    for m in mults:
        spark = (
            SparkSession.builder.master("local[32]")
            .config("spark.sql.shuffle.partitions", "32")
            .config("spark.ui.enabled", "true")
            .config("spark.ui.port", "4055")
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.driver.memory", "16g")
            .getOrCreate()
        )
        corpus = spark.read.parquet(
            os.path.join(_fixture_dir(m), "documents.parquet")
        )
        # FIXED probe batch across multipliers: replica-0 fixture docs
        # (every multiplier's fixture contains the same replica 0), so
        # the batch genuinely hits the index — pairs found BY
        # CONSTRUCTION, not a vacuous zero-candidate walk (the d19
        # non-vacuousness lesson)
        n_base = spark.read.parquet(BASE).count()
        batch = corpus.filter(
            (F.col("doc_id") < n_base)
            & (F.pmod(F.col("doc_id"), F.lit(97)) == 1)
        )
        idx_path = os.path.join(FIXTURES, f"probe_idx_x{m}")
        write_minhash_index(spark, corpus, idx_path)
        idx_files, idx_bytes = _tree_stats(idx_path)
        pre = input_bytes(spark)
        t0 = time.time()
        n_pairs = probe_minhash_index(spark, idx_path, batch).count()
        wall = time.time() - t0
        probe_bytes = input_bytes(spark) - pre
        print(
            json.dumps(
                {
                    "probe": "minhash",
                    "mult": m,
                    "index_files": idx_files,
                    "index_bytes": idx_bytes,
                    "probe_input_bytes": probe_bytes,
                    "probe_frac_of_index": round(
                        probe_bytes / max(idx_bytes, 1), 4
                    ),
                    "wall_s": round(wall, 2),
                    "n_pairs": n_pairs,
                }
            ),
            flush=True,
        )
        spark.stop()


def cc_rounds_main(mults: list[int]) -> None:
    """g05/d15 fixpoint audit (VERDICT r11 item 6): the two iterative
    graph rows' cost model is rounds x per-round-shuffle, so report
    BOTH per multiplier: rounds-to-fixpoint (measured through
    cc_star's public max_iters contract — min k that converges; the
    guard raises below it) and the converged run's wall + shuffle,
    with shuffle/rounds as the per-round figure. Edges are
    localCheckpoint-materialized first so the edge-generation shuffle
    (d03's banding / the engagement-graph build) is excluded from the
    fixpoint's accounting."""
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    boot = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    items_dirs = {}
    for m in mults:
        build_fixture(boot, m)
        items_dirs[m] = build_events_fixture_items(boot, m)
    boot.stop()

    for m in mults:
        spark = (
            SparkSession.builder.master("local[32]")
            .config("spark.sql.shuffle.partitions", "32")
            .config("spark.ui.enabled", "true")
            .config("spark.ui.port", "4055")
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.driver.memory", "16g")
            .getOrCreate()
        )
        from rfb_data_pipeline_spark.operators.dedup import (
            cc_star,
            d03_minhash_lsh,
        )
        from rfb_data_pipeline_spark.operators.graph import _graph_base

        sf_dir = _fixture_dir(m)

        def _engagement_edges(base_dir=sf_dir):
            arcs, _ = _graph_base(spark, base_dir)
            return arcs.where(F.col("src") < F.col("dst")).select(
                F.col("src").cast("bigint").alias("u"),
                F.col("dst").cast("bigint").alias("v"),
            )

        def _neardup_edges():
            return d03_minhash_lsh(spark, sf_dir).select(
                F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
            )

        for op, mk in (
            ("g05_engagement_cc", _engagement_edges),
            # item-growth axis: the user fixture saturates the item
            # graph, so g05's growing-edge evidence comes from the
            # replicated-item-catalog fixture (block-diagonal growth)
            (
                "g05_engagement_cc_items",
                lambda: _engagement_edges(items_dirs[m]),
            ),
            ("d15_neardup_cc", _neardup_edges),
        ):
            edges = mk().localCheckpoint(eager=True)
            n_edges = edges.count()
            rounds = None
            for k in range(1, 25):
                try:
                    cc_star(edges, max_iters=k).count()
                    rounds = k
                    break
                except RuntimeError:
                    continue
            pre = shuffle_write_bytes(spark)
            t0 = time.time()
            n_labels = cc_star(edges).count()
            wall = time.time() - t0
            run_bytes = shuffle_write_bytes(spark) - pre
            print(
                json.dumps(
                    {
                        "probe": "cc_rounds",
                        "op": op,
                        "mult": m,
                        "n_edges": n_edges,
                        "n_labeled_nodes": n_labels,
                        "rounds_to_fixpoint": rounds,
                        "wall_s": round(wall, 2),
                        "shuffle_bytes": run_bytes,
                        "per_round_bytes": run_bytes // max(rounds or 1, 1),
                    }
                ),
                flush=True,
            )
        spark.stop()


def main() -> None:
    args = sys.argv[1:]
    if args and args[0] == "--probe":
        probe_main([int(a) for a in args[1:]] or [1, 10])
        return
    if args and args[0] == "--cc-rounds":
        cc_rounds_main([int(a) for a in args[1:]] or [1, 3, 10])
        return
    op_names = ["d13"]
    if args and args[0].startswith("--ops"):
        flag = args.pop(0)
        if "=" in flag:
            op_names = flag.split("=", 1)[1].split(",")
        elif args:  # space-separated form: --ops d13,d03
            op_names = args.pop(0).split(",")
        else:
            sys.exit("usage: scale_check.py [--ops=d13,d03,x09,t11] [mults...]")
        unknown = set(op_names) - set(_ops())
        if unknown:
            sys.exit(f"unknown ops {sorted(unknown)}; choose from {sorted(_ops())}")
    mults = [int(a) for a in args] or [1, 3, 10]
    from pyspark.sql import SparkSession

    ops = {k: v for k, v in _ops().items() if k in op_names}

    # One bootstrap session to build fixtures (UI off, cheap).
    boot = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    for m in mults:
        build_fixture(boot, m)
        if "p01" in ops:  # p01 derives its month from orders+nation
            build_orders_fixture(boot, m)
    boot.stop()

    for op_name, fn in ops.items():
        for m in mults:
            # Fresh session per (op, multiplier) so REST stage metrics
            # are attributable to this run alone; UI on for the API.
            spark = (
                SparkSession.builder.master("local[32]")
                .config("spark.sql.shuffle.partitions", "32")
                .config("spark.ui.enabled", "true")
                .config("spark.ui.port", "4055")
                .config("spark.sql.session.timeZone", "UTC")
                .config("spark.driver.memory", "16g")
                .getOrCreate()
            )
            # warm
            for t in ("documents.parquet", "embeddings.parquet", "events.parquet"):
                p = os.path.join(_fixture_dir(m), t)
                if os.path.exists(p):
                    spark.read.parquet(p).count()
            pre_bytes = shuffle_write_bytes(spark)
            t0 = time.time()
            n_rows = _force_full_eval(fn(spark, _fixture_dir(m)))
            wall = time.time() - t0
            bytes_run = shuffle_write_bytes(spark) - pre_bytes
            print(
                json.dumps(
                    {
                        "op": op_name,
                        "mult": m,
                        "wall_s": round(wall, 2),
                        "shuffle_write_bytes": bytes_run,
                        "n_rows": n_rows,
                    }
                ),
                flush=True,
            )
            spark.stop()


if __name__ == "__main__":
    main()
