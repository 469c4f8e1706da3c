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


def cluster_table(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    cluster_cols: list[str],
    target_files: int = 8,
) -> None:
    """Range-cluster a table for data skipping (the sort-based cousin
    of Z-ordering): ``repartitionByRange`` on the cluster columns puts
    disjoint value ranges in disjoint files, and
    ``sortWithinPartitions`` tightens every row group's min/max, so a
    selective filter on those columns prunes whole files/row-groups
    from the footer statistics alone — no data pages read.

    At 100 TB this is the difference between a point-range query
    scanning the table and scanning a handful of files: parquet
    readers (and Spark's parquet filter pushdown) skip any row group
    whose [min, max] cannot satisfy the predicate. The rewrite is one
    range shuffle + a local sort — linear, and only run as a
    maintenance pass after loads (same lifecycle slot as
    ``compact_partition``).

    Caveat pinned in tests: range partitioning by sampling is
    allowed to place boundary duplicates in adjacent files — the
    guarantee is *monotone non-overlapping ranges up to boundary
    ties*, which is exactly what footer-stat pruning needs.
    """
    df = spark.read.parquet(in_dir)
    (
        df.repartitionByRange(target_files, *[F.col(c) for c in cluster_cols])
        .sortWithinPartitions(*cluster_cols)
        .write.mode("overwrite")
        .parquet(out_dir)
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
