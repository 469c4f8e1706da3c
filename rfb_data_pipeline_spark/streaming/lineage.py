"""Checkpoint-lineage handling for batch-id-keyed streaming sinks.

Every foreachBatch sink in this package is keyed by ``_batch_id`` with
dynamic partition overwrite, so REPLAYING a batch within one checkpoint
lineage replaces exactly its own output (the A19/A20 exactly-once
story). Batch ids are only meaningful WITHIN a checkpoint: wipe the
checkpoint and ids restart at 0. What happens to a sink that already
carries a previous lineage's partitions splits by sink kind:

- **Cumulative state** (the span index's ``spans_stream`` appends):
  old batches are load-bearing state — adopting a new lineage would
  collide ids and double-count. That sink FAILS CLOSED
  (``dedup_stream.assert_stream_lineage``).
- **Recomputable projections** (curated corpus, quality scores, cell
  assignments, edge logs, drift/event aggregates — everything else):
  the sink is a pure function of the input backlog, and re-running the
  same backlog under a fresh checkpoint is a SUPPORTED operational
  move (test-pinned: rescoring a drop is idempotent). The hazard is
  narrower — a new lineage over a SMALLER backlog overwrites only the
  batch ids it reaches, leaving the old lineage's higher-numbered
  partitions mixed in (silent phantom rows, r11 review). The correct
  reconciliation is to CLEAR the sink when the lineage changes: stale
  projections are re-derivable by definition, mixing them is not.

``reconcile_on_first_batch`` wraps a foreachBatch callable with that
reconciliation, deferred to the first batch of the run because Spark
writes ``<checkpoint>/metadata`` (the query id = the lineage) only at
stream start. Local-filesystem semantics for the clear, like
``write_span_index``; route through the Hadoop FS API on an object
store.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def checkpoint_lineage(spark: SparkSession, checkpoint_dir: str) -> str:
    """The streaming query id Spark records at ``<checkpoint>/metadata``
    on stream start — stable across restarts of one checkpoint, fresh
    when the checkpoint is wiped (exactly what "lineage" means for
    batch ids). Read as text + json.loads so a format-version prefix
    line (the offsets-file convention) can never silently yield a
    null id."""
    for row in spark.read.text(f"{checkpoint_dir}/metadata").collect():
        line = row["value"].strip()
        if line.startswith("{"):
            qid = json.loads(line).get("id")
            if qid:
                return str(qid)
    raise RuntimeError(
        f"no query id found in {checkpoint_dir}/metadata — cannot "
        "establish the checkpoint lineage batch-id-keyed sinks require"
    )


def _read_marker(spark: SparkSession, marker: str) -> str | None:
    """Defensive marker read (the dedup_stream r11 idiom): an empty or
    corrupt marker dir reads as None, never a TypeError/KeyError."""
    from pyspark.errors import AnalysisException

    try:
        row = spark.read.json(marker).first()
    except AnalysisException:
        return None
    if row is None:
        return None
    v = row.asDict().get("lineage")
    return None if v is None else str(v)


def _sink_has_data(out_dir: str) -> bool:
    if not os.path.isdir(out_dir):
        return False
    for root, dirs, files in os.walk(out_dir):
        # skip metadata dirs (_lineage, _spark_metadata) but NOT
        # partition dirs, which also start with "_" when the partition
        # column does (_batch_id=0 — the standard sink layout here);
        # partition dirs always carry "="
        dirs[:] = [d for d in dirs if "=" in d or not d.startswith("_")]
        if any(not f.startswith((".", "_")) for f in files):
            return True
    return False


def _checkpoint_has_commits(checkpoint_dir: str | None) -> bool:
    """Whether the checkpoint has at least one COMMITTED batch — i.e.
    this run RESUMES an existing lineage rather than starting one."""
    if not checkpoint_dir:
        return False
    d = os.path.join(checkpoint_dir, "commits")
    return os.path.isdir(d) and any(
        not f.startswith((".", "_")) for f in os.listdir(d)
    )


def reconcile_sink_lineage(
    spark: SparkSession,
    out_dir: str,
    lineage: str,
    checkpoint_dir: str | None = None,
) -> bool:
    """Make ``out_dir`` safe for this lineage's batch ids. Same
    lineage → no-op (resume). Marker present but DIFFERENT → a
    confirmed lineage change: CLEAR the sink (a recomputable
    projection re-derives from the re-drained backlog; a
    stale-partition mix does not) and record the new lineage.

    No marker at all splits on the checkpoint (ADVICE r11): data under
    a checkpoint that already has committed batches is this very
    lineage's own pre-marker output (the upgrade path) — availableNow
    on a resumed checkpoint only processes NEW input, so clearing
    would be unrecoverable loss; ADOPT the lineage without clearing.
    Data under a fresh checkpoint (no commits) is unknown-origin and
    the run re-derives from batch 0, so clearing is both safe and
    required. Returns True when the sink was cleared."""
    marker = f"{out_dir}/_lineage"
    existing = _read_marker(spark, marker)
    if existing == lineage:
        return False
    cleared = False
    if existing is not None:
        shutil.rmtree(out_dir, ignore_errors=True)
        cleared = True
    elif _sink_has_data(out_dir) and not _checkpoint_has_commits(
        checkpoint_dir
    ):
        shutil.rmtree(out_dir, ignore_errors=True)
        cleared = True
    (
        spark.createDataFrame([(lineage,)], "lineage string")
        .coalesce(1)
        .write.mode("overwrite")
        .json(marker)
    )
    return cleared


def reconcile_on_first_batch(
    spark: SparkSession, out_dir: str, checkpoint_dir: str, inner
):
    """Wrap a foreachBatch callable so the sink is lineage-reconciled
    exactly once per run, BEFORE its first write (checkpoint metadata
    exists by then — the dedup_stream deferred-check pattern)."""
    done: list[bool] = []

    def write(batch_df: DataFrame, batch_id: int) -> None:
        if not done:
            reconcile_sink_lineage(
                spark,
                out_dir,
                checkpoint_lineage(spark, checkpoint_dir),
                checkpoint_dir=checkpoint_dir,
            )
            done.append(True)
        inner(batch_df, batch_id)

    return write
