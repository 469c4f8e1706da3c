"""Streaming incremental co-engagement graph maintenance: the
maintained edge table must EQUAL the batch recompute over the full
replayed history, survive batch replay unchanged, and emit negative
deltas when the non-monotone per-user cap evicts an item."""

from __future__ import annotations

import glob
import shutil

from pyspark.sql import functions as F

from rfb_data_pipeline_spark.operators.graph import co_engagement_edges
from rfb_data_pipeline_spark.streaming import graph_stream as gs
from tests.conftest import SF_SMALL


def _drop(df, in_dir, name):
    in_dir.mkdir(exist_ok=True)
    stage = in_dir.parent / f"stage_{name}"
    df.coalesce(1).write.parquet(str(stage))
    (src,) = glob.glob(str(stage / "*.parquet"))
    shutil.copy(src, in_dir / f"{name}.parquet")


def _edge_set(df):
    return {(r["src"], r["dst"]): r["w"] for r in df.collect()}


def test_stream_edges_match_batch(spark, tmp_path):
    ev = spark.read.parquet(SF_SMALL + "/events.parquet")
    lo, hi = ev.approxQuantile("event_id", [0.33, 0.66], 0.0)
    in_dir = tmp_path / "in"
    _drop(ev.where(F.col("event_id") <= lo), in_dir, "b0")
    _drop(
        ev.where((F.col("event_id") > lo) & (F.col("event_id") <= hi)),
        in_dir,
        "b1",
    )
    _drop(ev.where(F.col("event_id") > hi), in_dir, "b2")
    log_dir = str(tmp_path / "log")
    delta_dir = str(tmp_path / "delta")
    gs.run_incremental_graph(
        spark, str(in_dir), log_dir, delta_dir, str(tmp_path / "ckpt")
    )
    got = _edge_set(gs.current_edges(spark, delta_dir))
    want = _edge_set(co_engagement_edges(ev))
    assert got == want
    n_batches = (
        spark.read.parquet(delta_dir).select("_batch_id").distinct().count()
    )
    assert n_batches == 3
    # replay idempotence: re-apply the LAST batch verbatim
    last = ev.where(F.col("event_id") > hi)
    gs.apply_batch(spark, log_dir, delta_dir, last, 2)
    assert _edge_set(gs.current_edges(spark, delta_dir)) == want


def test_cap_eviction_emits_negative_deltas(spark, tmp_path, monkeypatch):
    """Batch 2 makes item 3 the user's hottest: with cap=2 it EVICTS
    item 2 from the top-K, so maintenance must retract edge (1,2) and
    create (1,3) — and still land exactly on the batch recompute."""
    import rfb_data_pipeline_spark.operators.graph as g

    monkeypatch.setattr(g, "_USER_ITEM_CAP", 2)
    mk = lambda pairs: spark.createDataFrame(  # noqa: E731
        [(u, '{"k": %d}' % k) for u, k in pairs],
        "user_id bigint, props string",
    )
    b0 = mk([(1, 1)] * 3 + [(1, 2)] * 2)  # counts {1:3, 2:2} → top2 {1,2}
    b1 = mk([(1, 3)] * 5)  # counts {1:3, 2:2, 3:5} → top2 {3, 1}
    log_dir, delta_dir = str(tmp_path / "log"), str(tmp_path / "delta")
    gs.apply_batch(spark, log_dir, delta_dir, b0, 0)
    gs.apply_batch(spark, log_dir, delta_dir, b1, 1)
    d1 = {
        (r["src"], r["dst"]): r["d"]
        for r in spark.read.parquet(delta_dir)
        .where(F.col("_batch_id") == 1)
        .collect()
    }
    assert d1 == {(1, 2): -1, (1, 3): 1}
    got = _edge_set(gs.current_edges(spark, delta_dir))
    want = _edge_set(co_engagement_edges(b0.unionByName(b1)))
    assert got == want == {(1, 3): 1}


def test_random_batch_partitions_match_batch(spark, tmp_path):
    """Seeded fuzz over the BATCHING AXIS: the stock event stream cut
    into K randomly-assigned micro-batches (not contiguous ranges —
    each batch touches most users, maximizing cap-recompute overlap)
    must still land exactly on the batch recompute. Two fixed seeds."""
    import random

    from pyspark.sql import functions as F

    ev = spark.read.parquet(SF_SMALL + "/events.parquet")
    want = _edge_set(co_engagement_edges(ev))
    for seed in (13, 47):
        rng = random.Random(seed)
        k = rng.randint(3, 5)
        # deterministic pseudo-random assignment computable in Spark:
        # batch = xxhash64(event_id, seed) mod k
        log_dir = str(tmp_path / f"log{seed}")
        delta_dir = str(tmp_path / f"delta{seed}")
        for b in range(k):
            batch = ev.where(
                F.pmod(F.xxhash64(F.col("event_id"), F.lit(seed)), F.lit(k))
                == b
            )
            gs.apply_batch(spark, log_dir, delta_dir, batch, b)
        got = _edge_set(gs.current_edges(spark, delta_dir))
        assert got == want, f"seed {seed} (k={k}) diverged"


def test_g07_replay_equals_batch_and_evicts(spark):
    """g07's driver row is only meaningful if the replay (a) lands on
    the batch recompute and (b) actually exercises the non-monotone
    cap (negative deltas) on stock data — otherwise it degenerates to
    a restyled g-edges query."""
    from rfb_data_pipeline_spark.operators.graph import (
        _REPLAY_BATCHES,
        g07_edge_stream_replay,
    )

    ev = spark.read.parquet(SF_SMALL + "/events.parquet")
    want = _edge_set(co_engagement_edges(ev))
    got = _edge_set(g07_edge_stream_replay(spark, SF_SMALL))
    assert got == want
    # non-vacuousness: at least one batch's recompute evicts an item
    # from some user's top-K (the replay would pass trivially if no
    # user ever crossed the cap mid-replay)
    item = F.from_json("props", "struct<k:int>").getField("k")
    per_bui = (
        ev.select(
            F.pmod(F.col("event_id"), F.lit(_REPLAY_BATCHES)).alias("b"),
            "user_id",
            item.alias("item"),
        )
        .where(F.col("item").isNotNull())
        .groupBy("b", "user_id", "item")
        .agg(F.count(F.lit(1)).alias("n_ev"))
        .localCheckpoint()
    )
    neg = 0
    for b in range(1, _REPLAY_BATCHES):
        bp = per_bui.where(F.col("b") == b).select("user_id", "item", "n_ev")
        oc = per_bui.where(F.col("b") < b).select("user_id", "item", "n_ev")
        neg += (
            gs.edge_deltas_core(oc, bp).where(F.col("d") < 0).count()
        )
    assert neg > 0, "replay never evicted — cap not exercised"


def test_g07_single_plan_matches_per_batch_core(spark):
    """r09: g07 no longer CALLS edge_deltas_core per batch — it is one
    cumulative-over-batch plan — so its claim to vouch for the
    stream's maintenance math needs a direct pin: the signed per-edge
    delta total from K explicit edge_deltas_core invocations (the
    live foreachBatch path) must equal g07's output after the
    stream's own w > 0 materialization rule."""
    from rfb_data_pipeline_spark.operators.graph import (
        _REPLAY_BATCHES,
        g07_edge_stream_replay,
    )

    ev = spark.read.parquet(SF_SMALL + "/events.parquet")
    item = F.from_json("props", "struct<k:int>").getField("k")
    per_bui = (
        ev.select(
            F.pmod(F.col("event_id"), F.lit(_REPLAY_BATCHES)).alias("b"),
            "user_id",
            item.alias("item"),
        )
        .where(F.col("item").isNotNull())
        .groupBy("b", "user_id", "item")
        .agg(F.count(F.lit(1)).alias("n_ev"))
        .localCheckpoint()
    )
    deltas = None
    for b in range(_REPLAY_BATCHES):
        bp = per_bui.where(F.col("b") == b).select("user_id", "item", "n_ev")
        oc = per_bui.where(F.col("b") < b).select("user_id", "item", "n_ev")
        d = gs.edge_deltas_core(oc, bp)
        deltas = d if deltas is None else deltas.unionByName(d)
    core = (
        deltas.groupBy("src", "dst")
        .agg(F.sum("d").cast("bigint").alias("w"))
        .where(F.col("w") > 0)
    )
    assert _edge_set(core) == _edge_set(
        g07_edge_stream_replay(spark, SF_SMALL)
    )
