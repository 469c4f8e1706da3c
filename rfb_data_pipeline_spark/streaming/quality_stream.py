"""Streaming quality scoring: batch-trained model, online inference.

The t15 lifecycle split the way production runs it: the Naive-Bayes
log-odds model is trained in BATCH over the curated reference corpus
(the expensive, rarely-refreshed step), then incoming documents
stream through ``nb_score`` — the SAME function the batch operator
uses, so stream and batch scores are identical by construction — via
a stream-static join against the (vocabulary-sized, broadcastable)
model frames. No streaming state: each micro-batch is scored
independently and lands in a batch-id-keyed idempotent sink, the
corpus_stream/vector_stream discipline.

Scale: the model is |vocab| rows (broadcast at 100 TB — a reference
vocabulary, not the corpus); per-batch work is one explode + one
broadcast join + one per-doc aggregate, all inside the micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rfb_data_pipeline_spark.catalog import load_tables
from rfb_data_pipeline_spark.operators.text import nb_score, nb_train


def train_quality_model(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Materialize the (cls, totals, prior) model frames from the
    static reference corpus. localCheckpoint pins the model so every
    micro-batch scores against the same snapshot (and the training
    scan never re-runs per batch)."""
    docs = load_tables(spark, sf_dir, tables=("documents",), register_views=False)[
        "documents"
    ]
    cls, totals, prior = nb_train(docs)
    return (
        cls.localCheckpoint(eager=True),
        totals.localCheckpoint(eager=True),
        prior.localCheckpoint(eager=True),
    )


def run_quality_scoring(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    model: tuple[DataFrame, DataFrame, DataFrame],
    max_files_per_trigger: int = 1,
):
    """Drain the document backlog through model scoring into a
    (pred_quality, batch_id)-partitioned idempotent sink."""
    cls, totals, prior = model
    stream = (
        spark.readStream.schema(
            "doc_id bigint, text string, lang string, source string"
        )
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(in_dir)
    )

    def write(batch_df: DataFrame, batch_id: int) -> None:
        scored = nb_score(batch_df, cls, totals, prior)
        (
            scored.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("pred_quality", "_batch_id")
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
