"""Streaming incremental dedup: stream == batch verdicts through the
shared probe, pruned index scan, idempotent batch-keyed sink."""

from __future__ import annotations

import glob
import shutil

from pyspark.sql import functions as F

from rfb_data_pipeline_spark.pipeline.ann_index import write_minhash_index
from rfb_data_pipeline_spark.streaming import dedup_stream as dds
from tests.conftest import SF_SMALL


def _drop(df, in_dir, name):
    in_dir.mkdir(exist_ok=True)
    stage = in_dir.parent / f"stage_{name}"
    df.coalesce(1).write.parquet(str(stage))
    (src,) = glob.glob(str(stage / "*.parquet"))
    shutil.copy(src, in_dir / f"{name}.parquet")


def test_stream_verdicts_match_batch_probe(spark, tmp_path):
    """Two micro-batches of 'new crawl' docs probed against the
    materialized even-doc corpus index must union to EXACTLY the
    verdicts of one static batch_verdicts call over the same docs —
    and the dup set must be non-empty (the corpus contains planted
    near-dups across the odd/even split)."""
    docs = spark.read.parquet(SF_SMALL + "/documents.parquet").select(
        "doc_id", "text", "lang", "source"
    )
    corpus = docs.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 0)
    batch = docs.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 1)
    index_path = str(tmp_path / "idx")
    write_minhash_index(spark, corpus, index_path)

    in_dir = tmp_path / "in"
    _drop(batch.filter(F.col("doc_id") % 4 == 1), in_dir, "b0")
    _drop(batch.filter(F.col("doc_id") % 4 == 3), in_dir, "b1")
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    dds.run_incremental_dedup(
        spark, str(in_dir), out_dir, ckpt, index_path, max_files_per_trigger=1
    )

    streamed = spark.read.parquet(out_dir).drop("_batch_id")
    static = dds.batch_verdicts(spark, index_path, batch)
    key = ["doc_id", "source", "is_dup", "best_jaccard", "matched_doc"]
    got = sorted(tuple(r) for r in streamed.select(*key).collect())
    want = sorted(tuple(r) for r in static.select(*key).collect())
    assert got == want
    assert len(got) == batch.count()
    assert sum(r[2] for r in got) > 0, "no dup found — vacuous fixture"
    # two micro-batches ran (one file per trigger)
    n_batches = spark.read.parquet(out_dir).select("_batch_id").distinct().count()
    assert n_batches == 2


def test_empty_micro_batch_flows_through_stream(spark, tmp_path):
    """VERDICT r06/ADVICE r05 closure, end to end: a micro-batch that
    contains ZERO rows (an empty crawl drop) must flow through
    run_incremental_dedup — probe, verdicts, batch-keyed sink — without
    crashing, and must not disturb the verdicts of the non-empty
    batches."""
    docs = spark.read.parquet(SF_SMALL + "/documents.parquet").select(
        "doc_id", "text", "lang", "source"
    )
    corpus = docs.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 0)
    batch = docs.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 1)
    index_path = str(tmp_path / "idx")
    write_minhash_index(spark, corpus, index_path)

    in_dir = tmp_path / "in"
    _drop(batch, in_dir, "b0")
    _drop(batch.filter(F.lit(False)), in_dir, "b1_empty")  # zero rows
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    dds.run_incremental_dedup(
        spark, str(in_dir), out_dir, ckpt, index_path, max_files_per_trigger=1
    )

    streamed = spark.read.parquet(out_dir)
    # the empty batch contributed a (possibly absent) empty partition;
    # the non-empty batch's verdicts are complete and intact
    assert streamed.count() == batch.count()
    static = dds.batch_verdicts(spark, index_path, batch)
    key = ["doc_id", "is_dup", "best_jaccard", "matched_doc"]
    got = sorted(tuple(r) for r in streamed.select(*key).collect())
    want = sorted(tuple(r) for r in static.select(*key).collect())
    assert got == want
    assert sum(r[1] for r in got) > 0, "no dup found — vacuous fixture"


def test_span_stream_budgets_match_d20(spark, tmp_path):
    """Two doc-id-ordered micro-batches of new crawl probed against
    the materialized even-doc span index — with the index absorbing
    each batch's unseen hashes — must union to EXACTLY d20's global
    removal budgets over the same odd/even split (arrival-order-wins
    == global first-copy when the feed is doc-id-ordered), and the
    budgets must be non-trivial."""
    from rfb_data_pipeline_spark.operators.dedup import (
        d20_incremental_span_dedup,
    )
    from rfb_data_pipeline_spark.pipeline.ann_index import write_span_index

    docs = spark.read.parquet(SF_SMALL + "/documents.parquet").select(
        "doc_id", "text", "lang", "source"
    )
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    index_path = str(tmp_path / "span_idx")
    write_span_index(spark, corpus, index_path)

    median = batch.approxQuantile("doc_id", [0.5], 0.0)[0]
    in_dir = tmp_path / "in"
    _drop(batch.filter(F.col("doc_id") <= median), in_dir, "b0")
    _drop(batch.filter(F.col("doc_id") > median), in_dir, "b1")
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    dds.run_incremental_span_dedup(
        spark, str(in_dir), out_dir, ckpt, index_path, max_files_per_trigger=1
    )

    streamed = {
        r["doc_id"]: (r["n_tokens"], r["tokens_removed"])
        for r in spark.read.parquet(out_dir).collect()
    }
    direct = {
        r["doc_id"]: (r["n_tokens"], r["tokens_removed"])
        for r in d20_incremental_span_dedup(spark, SF_SMALL).collect()
    }
    assert streamed == direct
    assert sum(v[1] for v in direct.values()) > 0, "vacuous fixture"
    n_batches = (
        spark.read.parquet(out_dir).select("_batch_id").distinct().count()
    )
    assert n_batches == 2


def test_span_replay_sees_pre_append_index_state(spark, tmp_path):
    """Replay idempotence (r09 review): a replayed batch must probe
    EXACTLY the index state its first attempt saw. The old in-place
    append let the replay find its own spans in the index and classify
    every one of them as a corpus dup."""
    from rfb_data_pipeline_spark.pipeline.ann_index import (
        probe_span_index,
        write_span_index,
    )

    docs = spark.read.parquet(SF_SMALL + "/documents.parquet").select(
        "doc_id", "text", "lang", "source"
    )
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    index_path = str(tmp_path / "span_idx")
    write_span_index(spark, corpus, index_path)

    def budgets(exclude):
        df = probe_span_index(
            spark, index_path, batch, exclude_src_batch=exclude
        )
        return {
            r["doc_id"]: (r["n_tokens"], r["tokens_removed"])
            for r in df.collect()
        }

    first = budgets(0)
    dds.append_unseen_spans(spark, index_path, batch, src_batch=0)
    # replay of batch 0: identical budgets despite the prior append
    assert budgets(0) == first
    # double-append (second replay) leaves the index set unchanged too
    dds.append_unseen_spans(spark, index_path, batch, src_batch=0)
    assert budgets(0) == first
    # non-vacuous: WITHOUT the exclusion the replay probe is
    # contaminated by its own append — every batch span reads as a
    # corpus dup
    naive = {
        r["doc_id"]: (r["n_tokens"], r["tokens_removed"])
        for r in probe_span_index(spark, index_path, batch).collect()
    }
    assert naive != first
    assert sum(v[1] for v in naive.values()) > sum(
        v[1] for v in first.values()
    )
    # the NEXT batch id legitimately sees batch 0's contribution
    nxt = budgets(1)
    assert nxt == naive


def test_stream_lineage_guard(spark, tmp_path):
    """ADVICE r09: reusing a span index path under a RESET checkpoint
    (batch ids restart at 0) must fail loudly — the marker records the
    first lineage, re-asserting it is idempotent, and a different
    lineage raises with the compaction instruction."""
    import pytest

    idx = str(tmp_path / "idx")
    dds.assert_stream_lineage(spark, idx, "run-A")
    dds.assert_stream_lineage(spark, idx, "run-A")  # idempotent
    with pytest.raises(RuntimeError, match="lineage"):
        dds.assert_stream_lineage(spark, idx, "run-B")
    # the marker's _-prefixed dir is invisible to spans_stream parquet
    # discovery (no data appended yet -> None, not an error)
    from rfb_data_pipeline_spark.pipeline.ann_index import _stream_spans

    assert _stream_spans(spark, idx) is None


def test_lineage_guard_refuses_pre_marker_appends(spark, tmp_path):
    """r10 review: an index whose spans_stream already carries appends
    but NO marker (written before the guard existed, or marker
    deleted) must refuse — silently adopting a new lineage re-creates
    the batch-id collision. write_span_index is the fold: it clears
    spans_stream (and the marker), after which streaming is allowed
    again."""
    import pytest

    from rfb_data_pipeline_spark.pipeline.ann_index import (
        _stream_spans,
        write_span_index,
    )

    docs = spark.read.parquet(SF_SMALL + "/documents.parquet").select(
        "doc_id", "text", "lang", "source"
    )
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1).limit(10)
    idx = str(tmp_path / "idx")
    write_span_index(spark, corpus, idx)
    # pre-marker appends (the old API shape: no lineage recorded)
    dds.append_unseen_spans(spark, idx, batch, src_batch=0)
    assert _stream_spans(spark, idx) is not None
    with pytest.raises(RuntimeError, match="no lineage marker"):
        dds.assert_stream_lineage(spark, idx, "run-A")
    # the documented remediation actually works: the fold clears the
    # stream tree, and a fresh lineage can then be established
    write_span_index(spark, corpus, idx)
    assert _stream_spans(spark, idx) is None
    dds.assert_stream_lineage(spark, idx, "run-A")


def test_span_stream_refuses_reset_checkpoint(spark, tmp_path):
    """End-to-end: run the span stream once, wipe ONLY the checkpoint,
    rerun against the same index path — the second run must refuse
    (RuntimeError via the foreachBatch guard) instead of silently
    colliding on batch ids."""
    import pytest

    from rfb_data_pipeline_spark.pipeline.ann_index import write_span_index
    from rfb_data_pipeline_spark.streaming.dedup_stream import (
        run_incremental_span_dedup,
    )

    docs = spark.read.parquet(SF_SMALL + "/documents.parquet").select(
        "doc_id", "text", "lang", "source"
    )
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1).limit(20)
    index_path = str(tmp_path / "span_idx")
    write_span_index(spark, corpus, index_path)

    in_dir = tmp_path / "in"
    _drop(batch, in_dir, "b0")
    run_incremental_span_dedup(
        spark,
        str(in_dir),
        str(tmp_path / "out1"),
        str(tmp_path / "ckpt1"),
        index_path,
    )
    # same lineage restart is fine (availableNow drains nothing new)
    run_incremental_span_dedup(
        spark,
        str(in_dir),
        str(tmp_path / "out1"),
        str(tmp_path / "ckpt1"),
        index_path,
    )
    # fresh checkpoint + reused index: fail loudly
    with pytest.raises(Exception, match="lineage"):
        run_incremental_span_dedup(
            spark,
            str(in_dir),
            str(tmp_path / "out2"),
            str(tmp_path / "ckpt2"),
            index_path,
        )
    # the error's remediation works end-to-end (r10 review): fold the
    # index, then the fresh checkpoint streams cleanly
    write_span_index(
        spark,
        spark.read.parquet(SF_SMALL + "/documents.parquet").select(
            "doc_id", "text", "lang", "source"
        ),
        index_path,
    )
    run_incremental_span_dedup(
        spark,
        str(in_dir),
        str(tmp_path / "out3"),
        str(tmp_path / "ckpt3"),
        index_path,
    )
    assert spark.read.parquet(str(tmp_path / "out3")).count() > 0


def test_lineage_guard_corrupt_marker_fails_closed(spark, tmp_path):
    """ADVICE r10: a crash between the old marker's delete and the new
    write can leave _lineage present but empty or corrupt. With
    appends in spans_stream the guard must fail CLOSED with its clean
    RuntimeError (batch ids unattributable), not a TypeError/KeyError
    from first() returning None or a field-less corrupt-record row."""
    import os

    import pytest

    from rfb_data_pipeline_spark.pipeline.ann_index import (
        _stream_spans,
        write_span_index,
    )

    docs = spark.read.parquet(SF_SMALL + "/documents.parquet").select(
        "doc_id", "text", "lang", "source"
    )
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1).limit(10)

    def _fresh_index(name: str) -> str:
        idx = str(tmp_path / name)
        write_span_index(spark, corpus, idx)
        dds.assert_stream_lineage(spark, idx, "run-A")
        dds.append_unseen_spans(spark, idx, batch, src_batch=0)
        assert _stream_spans(spark, idx) is not None
        return idx

    # marker dir present but EMPTY (delete survived, write didn't)
    idx = _fresh_index("idx_empty")
    marker = os.path.join(idx, "spans_stream", "_lineage")
    for f in os.listdir(marker):
        os.remove(os.path.join(marker, f))
    with pytest.raises(RuntimeError, match="no lineage marker"):
        dds.assert_stream_lineage(spark, idx, "run-A")

    # marker file present but CORRUPT (non-JSON bytes: the row comes
    # back as _corrupt_record with no 'lineage' field)
    idx2 = _fresh_index("idx_corrupt")
    marker2 = os.path.join(idx2, "spans_stream", "_lineage")
    for f in os.listdir(marker2):
        os.remove(os.path.join(marker2, f))
    with open(os.path.join(marker2, "part-corrupt.json"), "w") as fh:
        fh.write("!!! not json !!!\n")
    with pytest.raises(RuntimeError, match="no lineage marker"):
        dds.assert_stream_lineage(spark, idx2, "run-A")

    # and a JSON row carrying the WRONG field behaves the same
    idx3 = _fresh_index("idx_wrongfield")
    marker3 = os.path.join(idx3, "spans_stream", "_lineage")
    for f in os.listdir(marker3):
        os.remove(os.path.join(marker3, f))
    with open(os.path.join(marker3, "part-wrong.json"), "w") as fh:
        fh.write('{"not_lineage": "x"}\n')
    with pytest.raises(RuntimeError, match="no lineage marker"):
        dds.assert_stream_lineage(spark, idx3, "run-A")
