"""Streaming corpus curation: the x05 funnel as a continuous pipeline.

Documents arrive as file drops (the reference's monthly-drop shape,
reference src/main.py:59-71, generalized to a stream); each micro-batch
is exact-deduplicated against the recent-history state, quality-gated
with t02's rules, split-assigned with x01's deterministic md5 buckets,
and written through an idempotent batch-keyed sink. Every rule is the
SAME expression the batch operators use — stream/batch parity is a
test invariant, not an aspiration.

Scale/state notes:

- Dedup state is bounded by the watermark horizon over ``ingest_ts``
  (``dropDuplicatesWithinWatermark``): the store holds fingerprints
  for the active horizon only, never the full corpus. Corpus-wide
  history dedup is the BATCH operator d06 (anti-join against the
  materialized fingerprint index); the stream handles the in-horizon
  re-drops that dominate real feeds.
- The quality gate and split assignment are stateless maps — they add
  no store pressure and run inside codegen.
- The sink partitions by (split, _batch_id): replaying a micro-batch
  overwrites exactly its own output (the A19/A20 exactly-once story;
  batch-id keying per round-2 ADVICE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from rfb_data_pipeline_spark.operators.sampling import split_col
from rfb_data_pipeline_spark.operators.text import tokens_col

DOC_STREAM_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("source", StringType(), True),
        StructField("ingest_ts", TimestampType(), True),
    ]
)

DEFAULT_DOC_WATERMARK = "1 day"


def read_documents_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-source stream over a documents drop directory."""
    return (
        spark.readStream.format("parquet")
        .schema(DOC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(path)
    )


def fingerprint_col() -> F.Column:
    """d01's exact-dedup fingerprint — the shared stream/batch rule."""
    return F.md5(F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "))


def quality_col() -> F.Column:
    """t02's quality gate — the shared stream/batch rule (one copy,
    text.quality_gate)."""
    from rfb_data_pipeline_spark.operators.text import quality_gate

    return quality_gate()


def fingerprint_index(spark: SparkSession, index_dir: str) -> DataFrame:
    """The materialized historical fingerprint index (d06's static
    side): a parquet table with at least a ``fingerprint`` column. At
    100 TB this is written bucketed by fingerprint so the per-batch
    anti-join is co-located; small indexes broadcast automatically.
    localCheckpoint pins the distinct set once — stream-static joins
    re-evaluate the static plan per micro-batch, and without the pin
    every trigger would re-scan and re-distinct the full index (the
    train_quality_model/train_reference idiom)."""
    return (
        spark.read.parquet(index_dir)
        .select("fingerprint")
        .distinct()
        .localCheckpoint(eager=True)
    )


def curated_stream(
    docs: DataFrame,
    watermark: str = DEFAULT_DOC_WATERMARK,
    history_index: DataFrame | None = None,
) -> DataFrame:
    """quality gate → history anti-join → dedup-in-horizon → split.

    The gate runs FIRST (r09 review): the fingerprint is
    case/whitespace-normalized while the gate is not, so gating after
    dedup let a gate-FAILING case-variant that arrived first shadow a
    gate-passing twin — the passing document was silently lost and
    stream/batch parity broke at the fingerprint level. Gating each
    document on its own text first makes the surviving fingerprint
    set order-independent: exactly the fingerprints with at least one
    passing document.

    ``history_index`` is the STREAM-STATIC left-anti join — the
    streaming twin of batch d06 (incremental dedup against the
    materialized corpus index). The watermark-bounded state store then
    only has to absorb in-horizon re-drops; corpus-wide history lives
    in the static index, not in streaming state. Stateless per batch:
    no store pressure, retriable, and the join is an equi-join on the
    fingerprint key.
    """
    fingerprinted = docs.filter(quality_col()).withColumn(
        "fingerprint", fingerprint_col()
    )
    if history_index is not None:
        fingerprinted = fingerprinted.join(
            history_index, "fingerprint", "left_anti"
        )
    deduped = (
        fingerprinted.withWatermark("ingest_ts", watermark)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )
    return (
        deduped.withColumn("split", split_col(F.col("doc_id")))
        .withColumn("n_tokens", F.size(tokens_col()))
        .select(
            "doc_id", "lang", "source", "fingerprint", "split", "n_tokens",
            "ingest_ts",
        )
    )


def curated_batch(docs: DataFrame) -> DataFrame:
    """The funnel's BATCH replay: identical rule columns in the same
    gate-first order, with dropDuplicatesWithinWatermark replaced by a
    CANONICAL survivorship rule — min doc_id per fingerprint AMONG the
    gate-passing documents. Used by the driver-visible
    e16_stream_replay query and by the stream/batch parity tests, so
    there is exactly one copy of each rule.

    Survivorship caveat: across micro-batches the stream keeps the
    EARLIER batch's doc (deterministic); within one micro-batch
    dropDuplicatesWithinWatermark keeps an arbitrary first-encountered
    row per key, which coincides with min doc_id only when each drop
    file is a single split read in order (how the parity test builds
    its backlog, and how maxFilesPerTrigger=1 file drops behave). The
    batch replay always pins the canonical min-id choice; with the
    gate first, parity at the FINGERPRINT level is exact regardless of
    arrival order — only the surviving doc_id can differ.
    """
    from pyspark.sql.window import Window

    gated = docs.filter(quality_col()).withColumn(
        "fingerprint", fingerprint_col()
    )
    w = Window.partitionBy("fingerprint")
    survived = gated.withColumn(
        "_first", F.col("doc_id") == F.min("doc_id").over(w)
    ).filter("_first")
    return (
        survived.withColumn("split", split_col(F.col("doc_id")))
        .withColumn("n_tokens", F.size(tokens_col()))
        .select("doc_id", "lang", "source", "fingerprint", "split", "n_tokens")
    )


def idempotent_corpus_sink(out_dir: str):
    """foreachBatch writer partitioned by (split, _batch_id): replaying
    a batch replaces exactly its own earlier output."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        # Per-writer option, NOT spark.conf.set: a session-wide
        # partitionOverwriteMode=dynamic would silently turn every later
        # plain overwrite in the same session from full-table into
        # dynamic (ADVICE r03).
        (
            batch_df.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("split", "_batch_id")
            .parquet(out_dir)
        )

    return write


def run_curation(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = DEFAULT_DOC_WATERMARK,
    max_files_per_trigger: int = 1,
    history_index_dir: str | None = None,
):
    """Process the current backlog (availableNow) through the funnel."""
    stream = curated_stream(
        read_documents_stream(spark, in_dir, max_files_per_trigger),
        watermark,
        history_index=(
            fingerprint_index(spark, history_index_dir)
            if history_index_dir
            else None
        ),
    )
    from rfb_data_pipeline_spark.streaming.lineage import (
        reconcile_on_first_batch,
    )

    q = (
        stream.writeStream.option("checkpointLocation", checkpoint_dir)
        .foreachBatch(
            reconcile_on_first_batch(
                spark, out_dir, checkpoint_dir, idempotent_corpus_sink(out_dir)
            )
        )
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
