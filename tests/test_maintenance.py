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


def test_cluster_table_enables_file_and_rowgroup_skipping(spark, tmp_path):
    """Range-clustering puts disjoint user_id ranges in disjoint files:
    for a selective user_id range predicate, footer [min, max] stats
    exclude almost every clustered file, while the unclustered layout
    overlaps everywhere (every file intersects the probe). Data
    identical; only layout changes."""
    import glob

    import pyarrow.parquet as pq

    from rfb_data_pipeline_spark.pipeline.maintenance import cluster_table

    src = str(tmp_path / "src")
    # ids deliberately round-robined so every unclustered file spans
    # the whole id range (the worst — and typical post-shuffle — case)
    spark.range(0, 20000).select(
        (F.col("id") % 1000).alias("user_id"),
        F.col("id").alias("event_id"),
    ).repartition(8).write.parquet(src)

    clustered = str(tmp_path / "clustered")
    cluster_table(spark, src, clustered, ["user_id"], target_files=8)

    def intersecting_files(d: str, lo: int, hi: int) -> tuple[int, int]:
        hit, total = 0, 0
        for f in glob.glob(d + "/*.parquet"):
            md = pq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                col = next(
                    md.row_group(rg).column(i)
                    for i in range(md.row_group(rg).num_columns)
                    if md.row_group(rg).column(i).path_in_schema == "user_id"
                )
                total += 1
                st = col.statistics
                if st.min <= hi and st.max >= lo:
                    hit += 1
        return hit, total

    lo, hi = 100, 120  # 2% of the id space
    hit_un, tot_un = intersecting_files(src, lo, hi)
    hit_cl, tot_cl = intersecting_files(clustered, lo, hi)
    # unclustered: every row group intersects the probe range
    assert hit_un == tot_un and tot_un >= 8
    # clustered: at most 2 row groups can intersect (range + boundary tie)
    assert tot_cl >= 8 and hit_cl <= 2

    # identical data
    a = spark.read.parquet(src).agg(
        F.sum("user_id"), F.sum("event_id"), F.count(F.lit(1))
    ).collect()[0]
    b = spark.read.parquet(clustered).agg(
        F.sum("user_id"), F.sum("event_id"), F.count(F.lit(1))
    ).collect()[0]
    assert tuple(a) == tuple(b)
