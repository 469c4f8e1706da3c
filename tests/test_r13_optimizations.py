"""Round-13 optimization equivalence guards.

Each r13 rewrite is bit-identical ONLY under a stated precondition
(pairs already strict+distinct, isolated nodes absent from arc
sources, seen/unseen split exhaustive). These tests pin both the
equivalences on synthetic frames and the preconditions on the real
fixture, so a future edit that breaks an assumption fails here before
it silently changes an oracle hash.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rfb_data_pipeline_spark.operators.dedup import cc_star

from tests.conftest import SF_SMALL


def _random_strict_pairs(seed: int, n_nodes: int = 60, n_edges: int = 90):
    rng = random.Random(seed)
    seen = set()
    while len(seen) < n_edges:
        u, v = rng.randrange(n_nodes), rng.randrange(n_nodes)
        if u != v:
            seen.add((max(u, v), min(u, v)))
    return sorted(seen)


def test_cc_star_pre_oriented_equals_default(spark):
    """On an already big→small strict DISTINCT edge list, skipping the
    intake normalization (pre_oriented=True) must yield the identical
    label map — the d15/g05/x17 call-site contract."""
    for seed in (1, 7, 42):
        rows = _random_strict_pairs(seed)
        edges = spark.createDataFrame(rows, "u bigint, v bigint")
        base = {
            r["doc_id"]: r["label"] for r in cc_star(edges).collect()
        }
        fast = {
            r["doc_id"]: r["label"]
            for r in cc_star(edges, pre_oriented=True).collect()
        }
        assert base == fast


def test_cc_star_materialized_flag_equals_default(spark):
    """materialized=True (g05's memoized-edges path) skips only the
    intake checkpoint job — labels identical."""
    rows = _random_strict_pairs(3)
    edges = spark.createDataFrame(rows, "u bigint, v bigint").localCheckpoint()
    base = {r["doc_id"]: r["label"] for r in cc_star(edges).collect()}
    fast = {
        r["doc_id"]: r["label"]
        for r in cc_star(edges, pre_oriented=True, materialized=True).collect()
    }
    assert base == fast


def test_d15_pair_intake_is_strict_and_distinct(spark):
    """Precondition of d15/x17's pre_oriented=True: d03's verified
    pairs are DISTINCT with doc_a < doc_b strictly."""
    from rfb_data_pipeline_spark.operators.dedup import d03_minhash_lsh

    pairs = d03_minhash_lsh(spark, SF_SMALL).select("doc_a", "doc_b")
    assert pairs.filter(F.col("doc_a") >= F.col("doc_b")).count() == 0
    assert pairs.count() == pairs.distinct().count()


def test_g05_edge_intake_is_strict_and_distinct(spark):
    """Precondition of g05's pre_oriented+materialized intake: the
    memoized edges frame is DISTINCT with src < dst strictly."""
    from rfb_data_pipeline_spark.operators.graph import _graph_shared

    edges = _graph_shared(spark, SF_SMALL).edges
    assert edges.filter(F.col("src") >= F.col("dst")).count() == 0
    key = edges.select("src", "dst")
    assert key.count() == key.distinct().count()


def test_isolated_nodes_absent_from_arc_sources(spark):
    """Precondition of the g01/g06 dead-union removal: an item with
    s = 0 never appears as an arc source (w >= 1 ⇒ any arc endpoint
    has strictly positive strength), so the per-round union rows could
    never match the join."""
    from rfb_data_pipeline_spark.operators.graph import _graph_shared

    gb = _graph_shared(spark, SF_SMALL)
    iso = gb.nodes.where(F.col("s") == 0).select(F.col("item").alias("src"))
    assert iso.join(gb.arcs, "src", "left_semi").count() == 0
    assert (
        iso.join(gb.arcs_s.select("src"), "src", "left_semi").count() == 0
    )
    # and the rewrite's other half: every arc endpoint has s > 0, so
    # post-round-1 rank/label state over contribution receivers covers
    # exactly the non-isolated universe
    nz = gb.nodes.where(F.col("s") > 0).count()
    recv = gb.arcs.select(F.col("dst").alias("item")).distinct().count()
    assert nz == recv


def test_d20_marker_join_equals_semi_anti_formulation(spark):
    """The r13 single-pass removal rule (left join + seen-or-rn>1
    filter) equals the old left_semi ∪ (left_anti + rank window)
    formulation row-for-row on the real span fixture."""
    from rfb_data_pipeline_spark.operators.dedup import _doc_spans_cached

    sp = _doc_spans_cached(spark, SF_SMALL)
    corpus_h = sp.filter(F.col("doc_id") % 2 == 0).select("h").distinct()
    batch_sp = sp.filter(F.col("doc_id") % 2 == 1)

    first_rank = Window.partitionBy("h").orderBy("doc_id", "s")
    old = (
        batch_sp.join(corpus_h, "h", "left_semi")
        .select("doc_id", "s")
        .unionByName(
            batch_sp.join(corpus_h, "h", "left_anti")
            .withColumn("rn", F.row_number().over(first_rank))
            .filter(F.col("rn") > 1)
            .select("doc_id", "s")
        )
    )
    new = (
        batch_sp.join(corpus_h.withColumn("seen", F.lit(1)), "h", "left")
        .withColumn("rn", F.row_number().over(first_rank))
        .filter(F.col("seen").isNotNull() | (F.col("rn") > 1))
        .select("doc_id", "s")
    )
    assert sorted(map(tuple, old.collect())) == sorted(
        map(tuple, new.collect())
    )


def test_token_stream_memo_matches_inline_explode(spark):
    """The t05-class substitution: the memoized (doc_id, pos, w) frame
    restricted to (doc_id, w) equals the inline explode + length>0
    filter it replaced, as a multiset."""
    from rfb_data_pipeline_spark.operators.text import (
        _toks_cached,
        tokens_col,
    )
    from rfb_data_pipeline_spark.operators.dedup import _docs

    inline = (
        _docs(spark, SF_SMALL)
        .select("doc_id", F.explode(tokens_col()).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("doc_id", "w")
        .count()
    )
    memo = (
        _toks_cached(spark, SF_SMALL)
        .groupBy("doc_id", "w")
        .count()
    )
    assert inline.exceptAll(memo).count() == 0
    assert memo.exceptAll(inline).count() == 0
