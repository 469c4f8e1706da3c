"""Table maintenance: small-file compaction for partitioned layouts.

Monthly incremental loads (and streaming foreachBatch sinks) accrete
small files; at cluster scale a scan's task count — and the
NameNode/listing pressure — is proportional to file count, so
periodic compaction is part of the table's lifecycle, not an
afterthought. ``compact_partition`` rewrites one partition to
``target_files`` files via the same dynamic-partition-overwrite path
the loads use, so a crash mid-compaction never loses data (the
overwrite is atomic per partition).
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def partition_file_count(table_dir: str, partition: str, value: str) -> int:
    return len(
        glob.glob(os.path.join(table_dir, f"{partition}={value}", "*.parquet"))
    )


def compact_partition(
    spark: SparkSession,
    table_dir: str,
    partition: str,
    value: str,
    target_files: int = 1,
) -> tuple[int, int]:
    """Rewrite one partition into ``target_files`` files.

    Returns (files_before, files_after). Row-identical by
    construction: the rewrite is a coalesce of the partition's own
    rows through the atomic overwrite path.
    """
    before = partition_file_count(table_dir, partition, value)
    # materialize the partition before overwriting its own files —
    # writing from a live scan of the same path risks read-under-
    # overwrite. (For partitions too big to checkpoint, stage to a
    # sibling dir and rename instead.)
    df = (
        spark.read.parquet(table_dir)
        .filter(F.col(partition) == value)
        .localCheckpoint(eager=True)
    )
    (
        df.coalesce(target_files)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition)
        .parquet(table_dir)
    )
    after = partition_file_count(table_dir, partition, value)
    return before, after
