"""Curated-corpus training-data export: the terminal sink of the
LLM-data side of the engine.

Composes the query-surface operators into one write:

1. curation flags (exact dedup survivor, quality gate, benchmark
   decontamination — the x05 funnel, same constants),
2. deterministic train/val/test split (x01's md5-bucket assignment),
3. deterministic shard assignment (x06's hash buckets),

then writes the surviving docs ONCE, partitioned by (split, shard),
and returns a per-partition manifest (doc/token counts + a content
checksum). Everything deterministic: re-running the export produces
byte-stable partition contents (modulo parquet encoding), which the
idempotence test pins via the checksum.

Scale notes: the flags are one wide pass + the broadcast decontam
semi-join; the write shuffles once on (split, shard) — for a 100 TB
corpus that is the minimum possible data movement (every row must
reach its shard). ``maxRecordsPerFile`` bounds file sizes; the
manifest aggregate reuses the write's partitioning, adding no extra
wide shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rfb_data_pipeline_spark.operators.sampling import (
    EVAL_MOD,
    N_SHARDS,
    _hash_bucket,
    split_col,
)
from rfb_data_pipeline_spark.operators.text import quality_gate, tokens_col


def curated_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents surviving the x05 funnel, with split/shard assigned."""
    from rfb_data_pipeline_spark.operators.dedup import _doc_shingles
    from rfb_data_pipeline_spark.operators.sampling import _docs

    docs = _docs(spark, sf_dir)
    corpus = docs.filter(F.col("doc_id") % EVAL_MOD != 0)

    w = Window.partitionBy(F.md5(F.col("text")))
    keep_dedup = F.col("doc_id") == F.min("doc_id").over(w)

    # ONE copy of the gate (text.quality_gate) — same rule as x05 and
    # the streaming funnel
    quality = quality_gate()
    n_tokens = F.size(tokens_col())

    sh = _doc_shingles(docs)
    eval_sh = (
        sh.filter(F.col("doc_id") % EVAL_MOD == 0).select("shingle").distinct()
    )
    contaminated = (
        sh.filter(F.col("doc_id") % EVAL_MOD != 0)
        .join(F.broadcast(eval_sh), "shingle", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("contam", F.lit(True))
    )

    return (
        corpus.withColumn("keep_dedup", keep_dedup)
        .withColumn("quality", quality)
        .withColumn("n_tokens", n_tokens)
        .join(contaminated, "doc_id", "left")
        .filter(
            F.col("keep_dedup")
            & F.col("quality")
            & F.col("contam").isNull()
        )
        .withColumn("split", split_col(F.col("doc_id")))
        .withColumn("shard", _hash_bucket(F.col("doc_id")) % N_SHARDS)
        .select("doc_id", "text", "lang", "source", "n_tokens", "split", "shard")
    )


def export_training_corpus(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    max_records_per_file: int = 100_000,
) -> DataFrame:
    """Write the curated corpus partitioned by (split, shard); return
    the manifest: one row per partition with doc/token counts and an
    order-insensitive content checksum (xor-free: sum of doc md5
    prefixes — associative, so partial aggregation is safe)."""
    curated = curated_docs(spark, sf_dir)
    (
        curated.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy("split", "shard")
        .parquet(out_dir)
    )
    back = spark.read.parquet(out_dir)
    checksum = F.sum(
        F.conv(F.substring(F.md5(F.col("text")), 1, 8), 16, 10).cast("long")
    )
    return back.groupBy("split", "shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        checksum.alias("content_checksum"),
    )
