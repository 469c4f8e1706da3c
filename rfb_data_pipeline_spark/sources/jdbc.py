"""JDBC source/sink (reference A9-A11, src/main.py:164-220).

The reference loads Postgres via pandas ``to_sql`` in 50k-row chunks
with multi-row INSERTs (src/main.py:204-205); Spark's JDBC writer
replaces the hand-rolled chunk loop with partition-parallel batched
writes, and ``truncate`` + overwrite replaces the manual
TRUNCATE-then-append transaction (src/main.py:198-200).

Scale knobs exposed here:
- write: ``numPartitions`` (parallel connections) and ``batchsize``
  (rows per INSERT batch) — the distributed versions of the
  reference's chunksize=50000/method='multi';
- read: partitioned reads via (partitionColumn, lowerBound,
  upperBound, numPartitions) so a big table scan is N parallel range
  queries instead of one cursor.

The primary sink of this engine is partitioned parquet (see
pipeline/ingest.py); JDBC stays the interop path. Tested live against
embedded Derby (shipped with Spark) in tests/test_jdbc.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    truncate: bool = False,
    batchsize: int = 10_000,
    num_partitions: int | None = None,
    properties: dict[str, str] | None = None,
) -> None:
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .option("truncate", "true" if truncate else "false")
    )
    if num_partitions:
        # bound the number of concurrent connections/batches
        writer = writer.option("numPartitions", str(num_partitions))
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.mode(mode).save()


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            # str(None) would reach the datasource as the literal
            # "None" and die in a NumberFormatException far from the
            # call site (r09 review)
            raise ValueError(
                "lower_bound and upper_bound are required when "
                "partition_column is set"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def overwrite_table(
    df: DataFrame, url: str, table: str, properties: dict[str, str] | None = None
) -> None:
    """Truncate-and-load semantics (reference A11) as one atomic-ish
    overwrite: with truncate=true Spark issues TRUNCATE TABLE and
    appends, preserving the table's DDL (indexes, grants)."""
    write_jdbc(df, url, table, mode="overwrite", truncate=True, properties=properties)
