"""Streaming incremental co-engagement graph maintenance: the
live-ingest half of the g-series lifecycle.

Events stream in; every micro-batch updates the user-item engagement
graph INCREMENTALLY — only the batch's touched users are recomputed —
and the maintained edge table is provably EQUAL to the batch
``co_engagement_edges`` over the full replayed history (pinned in
tests/test_graph_stream.py). The per-user top-K cap makes this
non-trivial: the capped item set is NON-monotone (a newly hot item can
evict an old one from a user's top-K), so maintenance must emit
negative edge deltas, not just increments.

Design — replay-idempotent by construction, on plain parquet:

- **Engagement log** (`log_dir`): each micro-batch appends its
  (user_id, item, n_ev) counts partitioned by `_batch_id` with
  dynamic partition overwrite — a replayed batch overwrites exactly
  its own partition. A user's current counts are the SUM across batch
  partitions; "state before batch B" is the sum over partitions
  `_batch_id != B`, which is replay-stable because availableNow
  triggers process batches in order (B replays before B+1 ever runs).
- **Edge-delta sink** (`delta_dir`): per batch, old vs new capped
  pair sets for the touched users only → ±1 deltas per (src, dst),
  batch-id-keyed dynamic overwrite (idempotent). The materialized
  edge table is the delta sum with w > 0 (``current_edges``); a
  periodic batch recompute (= ``co_engagement_edges``) compacts.

Scale: per micro-batch the work is bounded by touched users ×
C(cap, 2) pairs plus a partition-pruned, touched-user-semi-joined
read of the engagement log — never a full-graph recompute. The edge
aggregate itself is bounded by C(|items|, 2) regardless of user
count. At pipeline scale the log read is additionally bounded by
periodic compaction of the batch partitions into one base partition
(the write_span_index refresh discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from rfb_data_pipeline_spark.operators.graph import (
    capped_engagement,
    per_user_item_counts,
    user_item_pairs,
)
from rfb_data_pipeline_spark.plans.stage import stage_boundary

_LOG_SCHEMA = "user_id bigint, item int, n_ev bigint, _batch_id bigint"


def _read_log(spark: SparkSession, log_dir: str) -> DataFrame:
    try:
        return spark.read.parquet(log_dir)
    except AnalysisException:  # first batch: no log yet
        return spark.createDataFrame([], _LOG_SCHEMA)


def edge_deltas_core(
    old_counts: DataFrame, batch_per: DataFrame, *,
    old_aggregated: bool = False,
) -> DataFrame:
    """±1 edge deltas (src, dst, d) caused by adding ``batch_per``
    (a per-batch (user_id, item, n_ev) frame) onto the pre-batch
    engagement state ``old_counts`` (same shape, possibly
    un-aggregated). Only the batch's TOUCHED users are recomputed;
    deltas telescope per user, so summing every batch's deltas
    reconstructs the full-history capped edge set exactly.

    Shared by the live ``foreachBatch`` path (log-backed state) and
    the g07 driver-row replay (static splits), so the driver row
    vouches for the stream's maintenance math, not a lookalike.

    ``old_aggregated=True`` declares ``old_counts`` already one row
    per (user_id, item) AND already materialized (g07's folded state;
    a compacted log would qualify too) — the per-batch re-aggregation
    and its stage boundary are then skipped, leaving just the cheap
    touched-user semi-join. Results are identical either way (the
    re-aggregation is a no-op on aggregated input)."""
    touched = batch_per.select("user_id").distinct()
    old_per = old_counts.join(touched, "user_id", "left_semi")
    if not old_aggregated:
        old_per = (
            old_per.groupBy("user_id", "item")
            .agg(F.sum("n_ev").alias("n_ev"))
            .transform(stage_boundary)
        )
    new_per = (
        old_per.unionByName(batch_per)
        .groupBy("user_id", "item")
        .agg(F.sum("n_ev").alias("n_ev"))
    )
    old_pairs = user_item_pairs(capped_engagement(old_per))
    new_pairs = user_item_pairs(capped_engagement(new_per))
    return (
        new_pairs.withColumn("d", F.lit(1))
        .unionByName(old_pairs.withColumn("d", F.lit(-1)))
        .groupBy("src", "dst")
        .agg(F.sum("d").alias("d"))
        .where(F.col("d") != 0)
    )


def edge_deltas_for_batch(
    spark: SparkSession, log_dir: str, batch_ev: DataFrame, batch_id: int
) -> DataFrame:
    """±1 edge deltas (src, dst, d) this batch causes, computed from
    the pre-batch log state of the TOUCHED users only. Excluding the
    batch's own `_batch_id` partition from the "old" state (instead
    of trusting the log to not contain it) is what makes a replayed
    batch recompute the exact same deltas."""
    batch_per = per_user_item_counts(batch_ev).transform(stage_boundary)
    old_counts = _read_log(spark, log_dir).where(
        F.col("_batch_id") != F.lit(batch_id)
    ).select("user_id", "item", "n_ev")
    return edge_deltas_core(old_counts, batch_per)


def current_edges(spark: SparkSession, delta_dir: str) -> DataFrame:
    """The maintained edge table: delta sum over every batch
    partition, surviving edges only — EQUAL to the batch
    ``co_engagement_edges`` over the replayed history."""
    return (
        spark.read.parquet(delta_dir)
        .groupBy("src", "dst")
        .agg(F.sum("d").alias("w"))
        .where(F.col("w") > 0)
    )


def apply_batch(
    spark: SparkSession,
    log_dir: str,
    delta_dir: str,
    batch_ev: DataFrame,
    batch_id: int,
) -> None:
    """One micro-batch's maintenance: delta sink first (reads the log
    EXCLUDING this batch id), then the log append — both batch-id-
    keyed dynamic overwrites, so any replay interleaving reproduces
    identical state."""
    deltas = edge_deltas_for_batch(spark, log_dir, batch_ev, batch_id)
    (
        deltas.withColumn("_batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_batch_id")
        .parquet(delta_dir)
    )
    (
        per_user_item_counts(batch_ev)
        .withColumn("_batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_batch_id")
        .parquet(log_dir)
    )


def run_incremental_graph(
    spark: SparkSession,
    in_dir: str,
    log_dir: str,
    delta_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
):
    """Drain the event backlog through incremental graph maintenance."""
    stream = (
        spark.readStream.schema(
            "event_id bigint, ts timestamp, user_id bigint,"
            " event_type string, value double, props string"
        )
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(in_dir)
    )

    from rfb_data_pipeline_spark.streaming.lineage import (
        checkpoint_lineage,
        reconcile_sink_lineage,
    )

    lineage_done: list[bool] = []

    def write(batch_df: DataFrame, batch_id: int) -> None:
        if not lineage_done:
            # BOTH trees are projections of the drained backlog (the
            # log is the union of per-batch count partitions, each
            # derived from its batch alone), so a fresh checkpoint —
            # which re-drains the whole backlog — re-derives them
            # completely; stale partitions from the old lineage must
            # be cleared, not mixed (r11 review)
            lin = checkpoint_lineage(spark, checkpoint_dir)
            reconcile_sink_lineage(
                spark, log_dir, lin, checkpoint_dir=checkpoint_dir
            )
            reconcile_sink_lineage(
                spark, delta_dir, lin, checkpoint_dir=checkpoint_dir
            )
            lineage_done.append(True)
        apply_batch(spark, log_dir, delta_dir, batch_df, batch_id)

    q = (
        stream.writeStream.option("checkpointLocation", checkpoint_dir)
        .foreachBatch(write)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
