"""Streaming vector ingestion: per-micro-batch IVF cell assignment.

The streaming half of the s05 IVF index lifecycle: centroids are
trained in BATCH (the expensive, rarely-refreshed step — s04/s08);
new embeddings then stream in and are assigned to their nearest cell
as they arrive, so the bucketed ANN index stays current without
re-clustering. The assignment is a stream-static broadcast join of
every incoming vector against the (tiny) centroid-array frame — the
same shape as corpus_stream's history anti-join: stateless per
micro-batch, retriable, no streaming state at all.

Scale: centroid frame is |cells|×DIM (broadcast); per-batch work is
one zip_with fold per (vector, cell) against the broadcast side —
linear in batch size, zero shuffle inside the micro-batch (the
min-by cell pick is a per-row array reduce, not an aggregation).
At 100 TB the assigned output lands partitioned by cell id, which is
exactly the bucketed layout the s05 probe path scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rfb_data_pipeline_spark.catalog import load_tables


def train_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid ARRAYS from the static embeddings table —
    the batch-trained side of the stream-static join. Delegates to the
    ONE copy of the centroid math (similarity.centroid_arrays,
    decimal-exact sums) so this path and the oracle-checked s12 path
    cannot drift."""
    from rfb_data_pipeline_spark.operators.similarity import centroid_arrays

    emb = load_tables(
        spark, sf_dir, tables=("embeddings",), register_views=False
    )["embeddings"]
    # localCheckpoint pins the trained frame: stream-static joins
    # re-evaluate the static plan per micro-batch, and without the pin
    # every trigger would re-run the full centroid aggregation (the
    # train_quality_model/train_reference idiom)
    return centroid_arrays(emb).localCheckpoint(eager=True)


def _d2(vec_col: str, cent_col) -> F.Column:
    from rfb_data_pipeline_spark.operators.similarity import squared_distance

    return squared_distance(vec_col, cent_col)


def assign_cells(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest-centroid cell per vector (works on a stream OR a static
    frame — the parity tests run both through this one function).

    The centroid frame is collapsed to ONE broadcast row holding every
    (cell, centroid) pair, so the per-vector argmin is a pure array
    reduce — no per-batch aggregation, no shuffle, streaming-safe.
    """
    cells = F.broadcast(
        centroids.agg(
            F.array_sort(
                F.collect_list(F.struct("label", "c_arr"))
            ).alias("cells")
        )
    )
    scored = vectors.crossJoin(cells).select(
        "vec_id",
        F.transform(
            "cells",
            lambda c: F.struct(
                _d2("embedding", c.getField("c_arr")).alias("d2"),
                c.getField("label").alias("cell"),
            ),
        ).alias("scored"),
    )
    best = F.array_min("scored")
    return scored.select(
        "vec_id",
        best.getField("cell").alias("cell"),
        (F.round(best.getField("d2"), 4) + F.lit(0.0)).alias("d2"),
    )


def run_vector_ingest(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    centroids: DataFrame,
    max_files_per_trigger: int = 1,
):
    """Drain the embedding backlog through cell assignment into a
    cell-partitioned, batch-id-keyed idempotent sink."""
    stream = (
        spark.readStream.schema(
            "vec_id bigint, embedding array<float>, label int"
        )
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(in_dir)
    )
    from rfb_data_pipeline_spark.streaming.lineage import (
        reconcile_on_first_batch,
    )

    if centroids.isEmpty():
        # an untrained/empty centroid frame would assign every vector
        # a NULL cell (array_min over an empty array) and land the
        # whole stream in the NULL partition — a misconfigured
        # centroid path must fail loud, not build a junk index
        # (r11 review)
        raise ValueError(
            "run_vector_ingest requires a non-empty trained centroid "
            "frame (train_centroids over the corpus)"
        )
    assigned = assign_cells(stream, centroids)

    def write(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("cell", "_batch_id")
            .parquet(out_dir)
        )

    q = (
        assigned.writeStream.option("checkpointLocation", checkpoint_dir)
        .foreachBatch(
            reconcile_on_first_batch(spark, out_dir, checkpoint_dir, write)
        )
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
