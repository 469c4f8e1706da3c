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
from rfb_data_pipeline_spark.plans.stage import stage_boundary


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


def zorder_key(c1, c2, bits: int = 16):
    """Morton/Z-order key: interleave the low ``bits`` bits of two
    non-negative int columns. Pure bit expressions (shift/and/or) —
    codegen, no UDF. Columns must be pre-normalized to [0, 2^bits).
    """
    z = F.lit(0).cast("long")
    one = F.lit(1).cast("long")
    for i in range(bits):
        b1 = F.shiftright(c1.cast("long"), i).bitwiseAND(one)
        b2 = F.shiftright(c2.cast("long"), i).bitwiseAND(one)
        z = z.bitwiseOR(F.shiftleft(b1, 2 * i + 1)).bitwiseOR(
            F.shiftleft(b2, 2 * i)
        )
    return z


def cluster_table_zorder(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    col_a: str,
    col_b: str,
    target_files: int = 16,
    bits: int = 16,
) -> None:
    """TWO-dimensional clustering via the Z-order curve: range-cluster
    on the interleaved key so every file covers a bounded region in
    BOTH columns. Single-column range clustering (``cluster_table``)
    prunes perfectly on its sort column and not at all on any other;
    the Z-layout trades a little per-column tightness for bounded
    min/max on both — a selective predicate on EITHER column (or a
    2-D box) skips most files from footer stats. This is the standard
    multi-dimensional data-skipping layout (Delta/Iceberg OPTIMIZE
    ZORDER BY) expressed with stock Spark: one expression column, one
    range shuffle, one local sort."""
    df = spark.read.parquet(in_dir)
    # Bit interleave silently truncates values outside [0, 2^bits) —
    # which would quietly destroy the layout this function promises —
    # so out-of-range inputs are an ERROR, not a degraded rewrite.
    # (To cluster arbitrary-range columns, rank them into the domain
    # first: a percent_rank * 2^bits pass, or widen bits.)
    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
    ).collect()[0]
    limit = 1 << bits
    if any(v is None for v in (lo_a, hi_a, lo_b, hi_b)):
        # empty table / all-NULL columns: min/max are None and the
        # range comparison below would be an opaque TypeError
        raise ValueError(
            f"zorder columns have no values to cluster on "
            f"({col_a}, {col_b}: empty input or all NULL)"
        )
    if lo_a < 0 or lo_b < 0 or hi_a >= limit or hi_b >= limit:
        raise ValueError(
            f"zorder columns must lie in [0, {limit}): "
            f"{col_a}=[{lo_a}, {hi_a}], {col_b}=[{lo_b}, {hi_b}] — "
            "rank/scale them into range or raise `bits`"
        )
    zk = zorder_key(F.col(col_a), F.col(col_b), bits).alias("_zk")
    (
        df.withColumn("_zk", zk)
        .repartitionByRange(target_files, F.col("_zk"))
        .sortWithinPartitions("_zk")
        .drop("_zk")
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
        .transform(stage_boundary)
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
