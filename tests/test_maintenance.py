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


def test_zorder_clustering_prunes_on_both_columns(spark, tmp_path):
    """Z-order vs single-column clustering: the x-clustered layout
    cannot prune a y-only probe (every file spans all y), while the
    Z-layout bounds both columns per file, so the same probe skips
    most row groups — and the Morton key math itself is pinned
    against a Python model."""
    import glob

    import pyarrow.parquet as pq

    from rfb_data_pipeline_spark.pipeline.maintenance import (
        cluster_table,
        cluster_table_zorder,
        zorder_key,
    )

    # pin the bit-interleave against a Python model
    probe = spark.createDataFrame(
        [(5, 9), (0, 0), (1023, 1), (777, 333)], "a int, b int"
    ).select("a", "b", zorder_key(F.col("a"), F.col("b"), 10).alias("z"))

    def morton(a: int, b: int, bits: int = 10) -> int:
        z = 0
        for i in range(bits):
            z |= ((a >> i) & 1) << (2 * i + 1) | ((b >> i) & 1) << (2 * i)
        return z

    for r in probe.collect():
        assert r["z"] == morton(r["a"], r["b"]), (r["a"], r["b"])

    src = str(tmp_path / "src")
    spark.range(0, 40000).select(
        (F.col("id") % 200).alias("x"),
        ((F.col("id") * 7919) % 200).alias("y"),
    ).repartition(4).write.parquet(src)

    xdir = str(tmp_path / "xclust")
    zdir = str(tmp_path / "zclust")
    cluster_table(spark, src, xdir, ["x"], target_files=16)
    cluster_table_zorder(spark, src, zdir, "x", "y", target_files=16, bits=8)

    def hit_ratio(d: str, col: str, lo: int, hi: int) -> tuple[int, int]:
        hit, total = 0, 0
        for f in glob.glob(d + "/*.parquet"):
            md = pq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                st = next(
                    md.row_group(rg).column(i).statistics
                    for i in range(md.row_group(rg).num_columns)
                    if md.row_group(rg).column(i).path_in_schema == col
                )
                total += 1
                if st.min <= hi and st.max >= lo:
                    hit += 1
        return hit, total

    # y-only probe over 5% of the y space
    yh_x, yt_x = hit_ratio(xdir, "y", 100, 109)
    yh_z, yt_z = hit_ratio(zdir, "y", 100, 109)
    assert yh_x == yt_x  # x-clustered: no y pruning possible
    assert yh_z <= yt_z // 2, (yh_z, yt_z)  # z-order: most groups skipped
    # and the z layout still prunes on x too
    xh_z, xt_z = hit_ratio(zdir, "x", 100, 109)
    assert xh_z <= xt_z // 2, (xh_z, xt_z)


def test_zorder_empty_input_fails_with_diagnostic(spark, tmp_path):
    """Empty table / all-NULL cluster columns: the range guard used to
    compare None < int (opaque TypeError); now a diagnostic ValueError
    (r09 review)."""
    import pytest as _pytest

    from rfb_data_pipeline_spark.pipeline.maintenance import (
        cluster_table_zorder,
    )

    src = str(tmp_path / "empty_in")
    spark.createDataFrame([], "a int, b int").write.parquet(src)
    with _pytest.raises(ValueError, match="no values to cluster"):
        cluster_table_zorder(
            spark, src, str(tmp_path / "out"), "a", "b"
        )
