"""Streaming incremental near-dup dedup: the live-ingest half of the
d16 lifecycle.

The corpus signature index is materialized in BATCH (the expensive,
rarely-refreshed step — ``pipeline/ann_index.py::write_minhash_index``:
(band_idx, shard)-partitioned buckets + shingle/size stores); newly
crawled documents then stream in and every micro-batch is LSH-probed
against that index and exact-Jaccard-verified, so a re-crawled,
lightly-edited page is flagged BEFORE it re-enters the corpus. The
probe is the ONE shared copy (``probe_minhash_index`` — the same
banding, threshold, and verification the oracle-checked d16 query
runs), so the stream and the batch path cannot drift apart (the
nb_score/kl_vs_reference discipline).

Per-doc verdicts land in a batch-id-keyed idempotent sink: doc_id,
source, is_dup, best_jaccard, matched_doc (highest-Jaccard corpus
match, min-doc_id tie-break — deterministic).

Scale: per micro-batch, batch-side shingle+signature cost is linear
in batch tokens; the index scan is partition-pruned to the batch's
(band_idx, shard) set; candidates stay an equi-join on banded keys
(never batch × corpus); verification touches only candidate rows of
the shingle store. No streaming state — each batch is stateless and
retriable, which is what makes the sink idempotent under replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def batch_verdicts(
    spark: SparkSession, index_path: str, batch_docs: DataFrame
) -> DataFrame:
    """Per-document dup verdicts for one (micro-)batch against the
    materialized index — works on a foreachBatch frame or any static
    frame (the parity test runs both through this one function)."""
    from rfb_data_pipeline_spark.pipeline.ann_index import (
        probe_minhash_index,
    )

    pairs = probe_minhash_index(spark, index_path, batch_docs)
    # deterministic best match: max jaccard, then MIN corpus doc —
    # max_by on (jaccard, -doc_corpus) picks exactly that
    best = pairs.groupBy("doc_batch").agg(
        F.max("jaccard").alias("best_jaccard"),
        F.max_by(
            "doc_corpus", F.struct(F.col("jaccard"), -F.col("doc_corpus"))
        ).alias("matched_doc"),
    )
    return (
        batch_docs.select("doc_id", "source")
        .join(best, batch_docs["doc_id"] == best["doc_batch"], "left")
        .select(
            "doc_id",
            "source",
            F.col("matched_doc").isNotNull().cast("int").alias("is_dup"),
            (F.coalesce(F.col("best_jaccard"), F.lit(0.0)) + F.lit(0.0)).alias(
                "best_jaccard"
            ),
            "matched_doc",
        )
    )


def run_incremental_dedup(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    index_path: str,
    max_files_per_trigger: int = 1,
):
    """Drain the crawl backlog through the index probe into a
    batch-id-keyed idempotent verdict sink."""
    stream = (
        spark.readStream.schema(
            "doc_id bigint, text string, lang string, source string"
        )
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(in_dir)
    )

    def write(batch_df: DataFrame, batch_id: int) -> None:
        verdicts = batch_verdicts(spark, index_path, batch_df).withColumn(
            "_batch_id", F.lit(batch_id)
        )
        (
            verdicts.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(out_dir)
        )

    q = (
        stream.writeStream.option("checkpointLocation", checkpoint_dir)
        .foreachBatch(write)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


# ---------------------------------------------------------------------------
# Span tier: the streaming half of the d20 lifecycle (exact-substring
# incremental dedup). The corpus span-hash index is materialized in
# batch (pipeline/ann_index.py::write_span_index); newly crawled
# documents stream in, every micro-batch's removal budget is computed
# through the ONE shared probe (probe_span_index — the same
# corpus-wins + batch-first-copy rules the oracle-checked d20 query
# runs), and the batch's corpus-UNSEEN hashes are then appended to
# the index so the NEXT micro-batch deduplicates against everything
# that arrived before it: arrival-order-wins, which equals d20's
# global (doc_id, s) first-copy rule whenever the crawl feed is
# doc-id-ordered (the parity test's drop discipline).
#
# Idempotency: the budget sink is batch-id-keyed (replay overwrites
# exactly its own partition) — and so is the index append: each
# batch's unseen hashes land under spans_stream/_src_batch=<id>,
# the probe for batch B sees only _src_batch < B, and a replay of B
# dynamic-overwrites its own _src_batch partition. A replayed batch
# therefore probes EXACTLY the index state its first attempt saw —
# its own prior append can neither flip its verdicts (the r09 review
# finding: the old in-place append made a replayed batch classify
# ALL of its spans as corpus dups) nor survive as partial files from
# a mid-append crash. A periodic batch refresh (write_span_index)
# folds spans_stream into the base tree.
#
# The batch-id keying assumes ONE checkpoint lineage: if the stream
# checkpoint is reset (batch ids restart at 0) while index_path is
# reused, the new run would both ignore the old run's appends and
# dynamic-overwrite its same-numbered partitions (ADVICE r09). The
# runner therefore records the checkpoint's query id in a
# ``spans_stream/_lineage`` marker and REFUSES to run against a
# marker from a different lineage — fold spans_stream into the base
# tree (write_span_index) before reusing the index path with a fresh
# checkpoint.


def assert_stream_lineage(
    spark: SparkSession, index_path: str, lineage: str
) -> None:
    """Fail loudly when ``spans_stream`` carries appends from a
    DIFFERENT checkpoint lineage (batch-id collisions would silently
    regress dedup verdicts); records ``lineage`` on first use. The
    marker lives under a ``_``-prefixed dir so parquet discovery of
    spans_stream ignores it."""
    from pyspark.errors import AnalysisException

    from rfb_data_pipeline_spark.pipeline.ann_index import _stream_spans

    marker = f"{index_path}/spans_stream/_lineage"
    existing = None
    try:
        row = spark.read.json(marker).first()
        # A crash between the old marker's delete and the new write can
        # leave the _lineage dir present but empty/corrupt: first() is
        # then None, or the inferred row lacks the field (corrupt JSON
        # surfaces as _corrupt_record). Treat both exactly like an
        # unreadable marker — the no-marker path below fails closed
        # when appends exist — instead of a TypeError/KeyError
        # (ADVICE r10).
        existing = None if row is None else row.asDict().get("lineage")
    except AnalysisException:
        pass
    if existing is None:
        if _stream_spans(spark, index_path) is not None:
            # appends exist but no marker (a pre-marker index, or a
            # hand-deleted marker): adopting the new lineage here
            # would re-create the exact batch-id collision this guard
            # exists to prevent (r10 review)
            raise RuntimeError(
                f"span index {index_path!r} carries spans_stream "
                "appends with no lineage marker (written before the "
                "lineage guard, or the marker was removed): batch ids "
                "cannot be attributed. Fold the stream appends into "
                "the base tree (write_span_index over the accepted "
                "corpus) before streaming against this index path."
            )
        (
            spark.createDataFrame([(lineage,)], "lineage string")
            .coalesce(1)
            .write.mode("overwrite")
            .json(marker)
        )
    elif existing != lineage:
        raise RuntimeError(
            f"span index {index_path!r} carries spans_stream appends "
            f"from checkpoint lineage {existing!r}, but this run's "
            f"checkpoint lineage is {lineage!r}: batch ids would "
            "collide and silently corrupt dedup verdicts. Fold the "
            "stream appends into the base tree (write_span_index over "
            "the accepted corpus) before reusing the index path with "
            "a new checkpoint."
        )


def _checkpoint_lineage(spark: SparkSession, checkpoint_dir: str) -> str:
    """The ONE copy lives in streaming/lineage.py since r11 (every
    batch-id-keyed sink needs it); kept as a module name because the
    span-stream tests and docs reference it here."""
    from rfb_data_pipeline_spark.streaming.lineage import checkpoint_lineage

    return checkpoint_lineage(spark, checkpoint_dir)


def append_unseen_spans(
    spark: SparkSession,
    index_path: str,
    batch_docs: DataFrame,
    *,
    src_batch: int,
) -> None:
    """Write the batch's corpus-unseen distinct span hashes to its own
    ``spans_stream/_src_batch=<src_batch>`` partition (the accepted-
    crawl index refresh, replay-idempotent by dynamic overwrite)."""
    from rfb_data_pipeline_spark.operators.dedup import _doc_spans
    from rfb_data_pipeline_spark.pipeline.ann_index import (
        _span_shard,
        _stream_spans,
    )
    from rfb_data_pipeline_spark.plans.stage import stage_boundary

    b_h = (
        _doc_spans(batch_docs)
        .select("h")
        .distinct()
        .withColumn("shard", _span_shard(F.col("h")))
    )
    seen = spark.read.parquet(f"{index_path}/spans").select("h")
    appended = _stream_spans(spark, index_path)
    if appended is not None:
        # earlier batches' appends count as seen; this batch's own
        # prior attempt (replay) does not — it is about to be
        # overwritten wholesale
        seen = seen.unionByName(
            appended.where(
                F.col("_src_batch") < F.lit(int(src_batch))
            ).select("h")
        )
    # stage_boundary materializes the anti-join BEFORE the append so
    # the write never scans the path it is appending to
    unseen = (
        b_h.join(seen, "h", "left_anti")
        .withColumn("_src_batch", F.lit(int(src_batch)))
        .transform(stage_boundary)
    )
    (
        unseen.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_src_batch", "shard")
        .parquet(f"{index_path}/spans_stream")
    )


def run_incremental_span_dedup(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    index_path: str,
    max_files_per_trigger: int = 1,
):
    """Drain the crawl backlog through the span-index probe into a
    batch-id-keyed idempotent budget sink, growing the index with
    each accepted batch's unseen spans."""
    from rfb_data_pipeline_spark.pipeline.ann_index import (
        probe_span_index,
    )

    stream = (
        spark.readStream.schema(
            "doc_id bigint, text string, lang string, source string"
        )
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(in_dir)
    )

    lineage_checked: list[bool] = []

    def write(batch_df: DataFrame, batch_id: int) -> None:
        if not lineage_checked:
            # once per run, BEFORE the first probe: a reused index
            # path under a reset checkpoint must fail loudly, not
            # silently collide on batch ids (ADVICE r09). The budget
            # SINK, by contrast, is a recomputable projection: after a
            # fold (write_span_index clears the appends, so the index
            # guard passes) a fresh checkpoint would otherwise leave
            # the old lineage's higher-numbered budget partitions
            # mixed in (r11 review).
            from rfb_data_pipeline_spark.streaming.lineage import (
                reconcile_sink_lineage,
            )

            lin = _checkpoint_lineage(spark, checkpoint_dir)
            assert_stream_lineage(spark, index_path, lin)
            # checkpoint_dir lets a pre-marker budget sink under a
            # RESUMED checkpoint be adopted instead of cleared
            # (ADVICE r12 review — the r11 fix missed this call site)
            reconcile_sink_lineage(
                spark, out_dir, lin, checkpoint_dir=checkpoint_dir
            )
            lineage_checked.append(True)
        budgets = probe_span_index(
            spark, index_path, batch_df, exclude_src_batch=batch_id
        ).withColumn("_batch_id", F.lit(batch_id))
        (
            budgets.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(out_dir)
        )
        append_unseen_spans(spark, index_path, batch_df, src_batch=batch_id)

    q = (
        stream.writeStream.option("checkpointLocation", checkpoint_dir)
        .foreachBatch(write)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
