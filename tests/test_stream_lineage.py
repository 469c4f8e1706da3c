"""Lineage reconciliation for batch-id-keyed projection sinks (r11):
a fresh checkpoint restarts batch ids at 0, and a SMALLER backlog then
overwrites only the ids it reaches — the old lineage's higher-numbered
partitions would linger mixed into the sink (silent phantom rows).
Reconciliation clears the sink on a lineage change (projections
re-derive by definition) and is a no-op on same-checkpoint resume.
The span INDEX keeps its fail-closed guard (cumulative state is not a
projection); its budget sink reconciles like the others."""

from __future__ import annotations

import glob
import shutil

from pyspark.sql import functions as F

from rfb_data_pipeline_spark.streaming import lineage as ln
from tests.conftest import SF_SMALL


def _stage_drops(spark, tmp_path, n_drops, rows_per_drop=10):
    docs = spark.read.parquet(SF_SMALL + "/documents.parquet").select(
        "doc_id", "text", "lang", "source"
    )
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i in range(n_drops):
        stage = tmp_path / f"stage{i}"
        (
            docs.filter(F.pmod(F.col("doc_id"), F.lit(n_drops)) == i)
            .limit(rows_per_drop)
            .coalesce(1)
            .write.parquet(str(stage))
        )
        (src,) = glob.glob(str(stage / "*.parquet"))
        shutil.copy(src, in_dir / f"drop{i}.parquet")
    return str(in_dir)


def test_reconcile_sink_lineage_unit(spark, tmp_path):
    out = str(tmp_path / "sink")
    # fresh sink: marker adopted, nothing cleared
    assert ln.reconcile_sink_lineage(spark, out, "L1") is False
    assert ln._read_marker(spark, f"{out}/_lineage") == "L1"
    # same lineage: no-op even with data present
    spark.range(3).write.parquet(f"{out}/_batch_id=0")
    assert ln.reconcile_sink_lineage(spark, out, "L1") is False
    assert spark.read.parquet(f"{out}/_batch_id=0").count() == 3
    # new lineage over existing data: cleared + re-marked
    assert ln.reconcile_sink_lineage(spark, out, "L2") is True
    assert ln._read_marker(spark, f"{out}/_lineage") == "L2"
    assert not ln._sink_has_data(out)
    # corrupt marker + data: treated as unknown lineage -> cleared
    spark.range(2).write.parquet(f"{out}/_batch_id=0")
    shutil.rmtree(f"{out}/_lineage")
    (tmp_path / "sink" / "_lineage").mkdir()
    (tmp_path / "sink" / "_lineage" / "part-corrupt.json").write_text(
        "!!! not json !!!\n"
    )
    assert ln.reconcile_sink_lineage(spark, out, "L3") is True
    assert ln._read_marker(spark, f"{out}/_lineage") == "L3"


def test_premarker_sink_resumed_checkpoint_adopts(spark, tmp_path):
    """ADVICE r11 (medium): a sink with data but NO _lineage marker
    under a checkpoint that already committed batches is this
    lineage's own pre-marker output — availableNow on the resumed
    checkpoint never re-derives history, so it must be ADOPTED, not
    cleared."""
    out = str(tmp_path / "sink")
    spark.range(5).write.parquet(f"{out}/_batch_id=0")
    ck = tmp_path / "ck"
    (ck / "commits").mkdir(parents=True)
    (ck / "commits" / "0").write_text("v1\n{}")
    assert (
        ln.reconcile_sink_lineage(spark, out, "L1", checkpoint_dir=str(ck))
        is False
    )
    assert spark.read.parquet(f"{out}/_batch_id=0").count() == 5
    assert ln._read_marker(spark, f"{out}/_lineage") == "L1"
    # but the SAME markerless sink under a FRESH checkpoint (no
    # commits) is unknown-origin data a from-batch-0 run re-derives:
    # cleared
    import shutil as _sh

    _sh.rmtree(f"{out}/_lineage")
    fresh = tmp_path / "ck_fresh"
    (fresh / "commits").mkdir(parents=True)
    assert (
        ln.reconcile_sink_lineage(
            spark, out, "L1", checkpoint_dir=str(fresh)
        )
        is True
    )
    assert not ln._sink_has_data(out)
    # a confirmed lineage CHANGE clears even on a resumed checkpoint
    spark.range(4).write.parquet(f"{out}/_batch_id=0")
    assert (
        ln.reconcile_sink_lineage(spark, out, "L2", checkpoint_dir=str(ck))
        is True
    )
    assert not ln._sink_has_data(out)


def test_premarker_sink_survives_resumed_run_end_to_end(spark, tmp_path):
    """Upgrade-path e2e: simulate a pre-r11 sink by deleting the
    marker after a first run, then resume the SAME checkpoint with a
    new drop — historical batch partitions must survive."""
    import os

    from rfb_data_pipeline_spark.streaming.corpus_stream import run_curation

    in_dir = _stage_drops(spark, tmp_path, 2, rows_per_drop=12)
    held = os.path.join(str(tmp_path), "held.parquet")
    os.rename(os.path.join(in_dir, "drop1.parquet"), held)
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    run_curation(spark, in_dir, out, ck)
    first = spark.read.parquet(out).count()
    shutil.rmtree(f"{out}/_lineage")  # pre-marker sink
    os.rename(held, os.path.join(in_dir, "drop1.parquet"))
    run_curation(spark, in_dir, out, ck)  # same checkpoint: resume
    after = spark.read.parquet(out)
    assert {r["_batch_id"] for r in after.collect()} == {0, 1}
    assert after.filter(F.col("_batch_id") == 0).count() == first


def test_fresh_checkpoint_smaller_backlog_drops_stale_batches(
    spark, tmp_path
):
    """The repro the reconciliation exists for: 3-drop backlog → 3
    batch partitions; backlog shrinks to 1 drop, checkpoint wiped —
    the re-run must NOT leave batches 1-2 from the old lineage mixed
    into the sink."""
    from rfb_data_pipeline_spark.streaming.corpus_stream import run_curation

    in_dir = _stage_drops(spark, tmp_path, 3, rows_per_drop=15)
    out = str(tmp_path / "out")
    run_curation(spark, in_dir, out, str(tmp_path / "ck1"))
    ids1 = {
        r["_batch_id"] for r in spark.read.parquet(out).collect()
    }
    assert ids1 == {0, 1, 2}
    # backlog shrinks; fresh checkpoint
    import os

    for f in ("drop1.parquet", "drop2.parquet"):
        os.remove(os.path.join(in_dir, f))
    run_curation(spark, in_dir, out, str(tmp_path / "ck2"))
    after = spark.read.parquet(out)
    assert {r["_batch_id"] for r in after.collect()} == {0}
    # and the surviving batch is the NEW lineage's derivation of drop0
    n_drop0 = spark.read.parquet(
        os.path.join(in_dir, "drop0.parquet")
    ).count()
    assert after.count() <= n_drop0  # funnel can only drop rows


def test_same_checkpoint_resume_does_not_clear(spark, tmp_path):
    """Resume semantics must survive the guard: new files under the
    SAME checkpoint append new batch partitions; earlier partitions
    stay."""
    from rfb_data_pipeline_spark.streaming.corpus_stream import run_curation

    in_dir = _stage_drops(spark, tmp_path, 2, rows_per_drop=12)
    import os

    held = os.path.join(str(tmp_path), "held.parquet")
    os.rename(os.path.join(in_dir, "drop1.parquet"), held)
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    run_curation(spark, in_dir, out, ck)
    first = spark.read.parquet(out).count()
    os.rename(held, os.path.join(in_dir, "drop1.parquet"))
    run_curation(spark, in_dir, out, ck)  # same checkpoint: resume
    after = spark.read.parquet(out)
    assert {r["_batch_id"] for r in after.collect()} == {0, 1}
    assert after.filter(F.col("_batch_id") == 0).count() == first


def test_span_budget_sink_reconciles_after_fold(spark, tmp_path):
    """The span stream's INDEX fails closed on a reset checkpoint —
    but after the documented remediation (write_span_index folds the
    appends), a fresh checkpoint is allowed, and the budget SINK must
    then drop the old lineage's partitions instead of mixing."""
    from rfb_data_pipeline_spark.pipeline.ann_index import write_span_index
    from rfb_data_pipeline_spark.streaming.dedup_stream import (
        run_incremental_span_dedup,
    )

    docs = spark.read.parquet(SF_SMALL + "/documents.parquet").select(
        "doc_id", "text", "lang", "source"
    )
    corpus = docs.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 0)
    idx = str(tmp_path / "idx")
    write_span_index(spark, corpus, idx)

    in_dir = _stage_drops(spark, tmp_path, 2, rows_per_drop=10)
    out = str(tmp_path / "out")
    run_incremental_span_dedup(
        spark, in_dir, out, str(tmp_path / "ck1"), idx
    )
    assert {
        r["_batch_id"] for r in spark.read.parquet(out).collect()
    } == {0, 1}
    # fold (clears appends + marker), shrink backlog, fresh checkpoint
    write_span_index(spark, corpus, idx)
    import os

    os.remove(os.path.join(in_dir, "drop1.parquet"))
    run_incremental_span_dedup(
        spark, in_dir, out, str(tmp_path / "ck2"), idx
    )
    assert {
        r["_batch_id"] for r in spark.read.parquet(out).collect()
    } == {0}


def test_span_budget_premarker_sink_survives_resume(spark, tmp_path):
    """r12 review: the adopt-on-resumed-checkpoint fix must cover the
    span stream's budget sink too — a pre-marker budget sink under
    the SAME checkpoint resumes without losing batch 0."""
    import os

    from rfb_data_pipeline_spark.pipeline.ann_index import write_span_index
    from rfb_data_pipeline_spark.streaming.dedup_stream import (
        run_incremental_span_dedup,
    )

    docs = spark.read.parquet(SF_SMALL + "/documents.parquet").select(
        "doc_id", "text", "lang", "source"
    )
    corpus = docs.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 0)
    idx = str(tmp_path / "idx")
    write_span_index(spark, corpus, idx)

    in_dir = _stage_drops(spark, tmp_path, 2, rows_per_drop=10)
    held = os.path.join(str(tmp_path), "held.parquet")
    os.rename(os.path.join(in_dir, "drop1.parquet"), held)
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    run_incremental_span_dedup(spark, in_dir, out, ck, idx)
    first = spark.read.parquet(out).count()
    shutil.rmtree(f"{out}/_lineage")  # pre-marker budget sink
    os.rename(held, os.path.join(in_dir, "drop1.parquet"))
    run_incremental_span_dedup(spark, in_dir, out, ck, idx)  # resume
    after = spark.read.parquet(out)
    assert {r["_batch_id"] for r in after.collect()} == {0, 1}
    assert after.filter(F.col("_batch_id") == 0).count() == first
