"""Compaction: many small files → few, content identical, other
partitions untouched."""

from __future__ import annotations

from pyspark.sql import functions as F

from rfb_data_pipeline_spark.pipeline.maintenance import (
    compact_partition,
    partition_file_count,
)


def test_compact_partition(spark, tmp_path):
    out = str(tmp_path / "t")
    df = spark.range(0, 10_000).select(
        F.col("id"),
        (F.when(F.col("id") % 2 == 0, "202405").otherwise("202406")).alias("ref_ym"),
    )
    # fragment the 202405 partition into many small files
    df.repartition(16).write.partitionBy("ref_ym").parquet(out)
    assert partition_file_count(out, "ref_ym", "202405") >= 8
    other_before = partition_file_count(out, "ref_ym", "202406")
    checksum_before = (
        spark.read.parquet(out)
        .filter("ref_ym = '202405'")
        .agg(F.sum("id"), F.count(F.lit(1)))
        .collect()[0]
    )

    before, after = compact_partition(spark, out, "ref_ym", "202405")
    assert before >= 8 and after == 1
    # data identical; sibling partition untouched
    checksum_after = (
        spark.read.parquet(out)
        .filter("ref_ym = '202405'")
        .agg(F.sum("id"), F.count(F.lit(1)))
        .collect()[0]
    )
    assert tuple(checksum_before) == tuple(checksum_after)
    assert partition_file_count(out, "ref_ym", "202406") == other_before
