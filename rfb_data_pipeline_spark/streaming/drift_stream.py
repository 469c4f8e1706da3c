"""Streaming distribution-drift monitor: x15's KL audit as a live
ingest guard.

A recurring crawl's unigram distribution drifting away from the
curated reference corpus is the earliest signal of a broken extractor,
a language-mix shift, or spam flooding a source. The reference term
distribution is trained in BATCH (one corpus aggregate, broadcastable
— a reference vocabulary, not the corpus) and every micro-batch is
scored
with the SAME smoothed-KL math (``kl_vs_reference`` is shared by the
stream and the parity test, so stream and batch cannot drift apart —
the nb_score/quality_stream discipline). Per-batch output lands in a
batch-id-keyed idempotent sink with a threshold flag.

Scale: per batch, one term aggregate + one join against the broadcast
reference + decimal-accumulated sum (exact, order-independent — the
x15 discipline); no streaming state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rfb_data_pipeline_spark.catalog import load_tables
from rfb_data_pipeline_spark.operators.text import tokens_col

DRIFT_KL_THRESHOLD = 0.5


def train_reference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(term, c_ref) over the reference corpus, pinned with
    localCheckpoint so every micro-batch scores the same snapshot."""
    docs = load_tables(spark, sf_dir, tables=("documents",), register_views=False)[
        "documents"
    ]
    counts = (
        docs.select(F.explode(tokens_col()).alias("term"))
        .filter(F.length("term") > 0)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c_ref"))
    )
    return counts.localCheckpoint(eager=True)


def kl_vs_reference(batch_docs: DataFrame, reference: DataFrame) -> DataFrame:
    """One-row KL(batch ‖ reference) with add-one smoothing over the
    union vocabulary — works on a micro-batch or any static frame
    (the parity test runs both through this one function)."""
    bt = (
        batch_docs.select(F.explode(tokens_col()).alias("term"))
        .filter(F.length("term") > 0)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c_batch"))
    )
    joined = bt.join(reference, "term", "full_outer").select(
        F.coalesce("c_batch", F.lit(0)).alias("c_batch"),
        F.coalesce("c_ref", F.lit(0)).alias("c_ref"),
    )
    totals = joined.agg(
        F.sum("c_batch").alias("t_batch"),
        F.sum("c_ref").alias("t_ref"),
        F.count(F.lit(1)).cast("double").alias("v"),
    )
    p = (F.col("c_batch") + 1).cast("double") / (F.col("t_batch") + F.col("v"))
    q = (F.col("c_ref") + 1).cast("double") / (F.col("t_ref") + F.col("v"))
    agg = joined.crossJoin(F.broadcast(totals)).agg(
        F.sum((p * F.log(p / q)).cast("decimal(28,18)")).alias("kl"),
        F.first("t_batch").alias("batch_tokens"),
        F.first("v").cast("bigint").alias("union_vocab"),
    )
    kl = F.round(F.col("kl").cast("double"), 4) + F.lit(0.0)
    return agg.select(
        "batch_tokens",
        "union_vocab",
        kl.alias("kl_vs_reference"),
        (kl > DRIFT_KL_THRESHOLD).cast("int").alias("drift_flag"),
    )


def run_drift_monitor(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    reference: DataFrame,
    max_files_per_trigger: int = 1,
):
    """Drain the document backlog; one drift row per micro-batch into
    a batch-id-keyed idempotent sink."""
    stream = (
        spark.readStream.schema(
            "doc_id bigint, text string, lang string, source string"
        )
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(in_dir)
    )

    def write(batch_df: DataFrame, batch_id: int) -> None:
        row = kl_vs_reference(batch_df, reference).withColumn(
            "_batch_id", F.lit(batch_id)
        )
        (
            row.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(out_dir)
        )

    from rfb_data_pipeline_spark.streaming.lineage import (
        reconcile_on_first_batch,
    )

    q = (
        stream.writeStream.option("checkpointLocation", checkpoint_dir)
        .foreachBatch(
            reconcile_on_first_batch(spark, out_dir, checkpoint_dir, write)
        )
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
