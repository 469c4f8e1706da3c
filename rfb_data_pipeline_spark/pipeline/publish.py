"""Publish the pipeline's silver tables to a relational DB — the
reference's actual sink, executed live.

The reference's load phase (src/main.py:164-220, ``fase_carga``) is,
per table: CREATE SCHEMA IF NOT EXISTS (A10, src/main.py:177), then
TRUNCATE TABLE (A11, src/main.py:198-200), chunked multi-row INSERTs
(A9, src/main.py:204-205), then SELECT COUNT(*) reconciled against
the file's line count (A12/A13, src/main.py:207-216) driving the
manifest's sucesso/falhou lattice. This engine's primary sink is
partitioned parquet (pipeline/ingest.py — the partition overwrite IS
the per-month truncate), and this module is the interop step that
completes the reference parity story end-to-end: push each silver
table through the JDBC sink with truncate-overwrite semantics and
count-reconcile what the DB reports back.

At scale the publish is per-table independent (no cross-table
shuffle): each table is one partition-parallel JDBC write sized by
``num_partitions``/``batchsize`` (sources/jdbc.py), and the
reconciliation count runs ON the DB via a ``(SELECT COUNT(*) ...)``
subquery dbtable — constant bytes back regardless of table size.
(r13, closing ADVICE r12: the JDBC v1 path behind ``read_jdbc`` does
NOT push aggregates down by default, so the previous
``read_jdbc(...).count()`` pulled every row over the wire after each
publish just to count it.) Tested live against embedded
Derby (shipped in Spark's jars) in tests/test_jdbc.py, so the sink
path executes unconditionally in CI; the same calls run against
Postgres et al. via the url/properties."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from rfb_data_pipeline_spark.sources.jdbc import overwrite_table, read_jdbc


def ensure_schema(
    spark: SparkSession,
    url: str,
    schema: str,
    properties: dict[str, str] | None = None,
) -> None:
    """CREATE SCHEMA IF NOT EXISTS (reference A10, src/main.py:177),
    dialect-tolerantly: issued through a plain JDBC connection from
    the driver JVM (Spark's datasource API has no DDL verb). Dialects
    without IF NOT EXISTS (Derby) get a bare CREATE SCHEMA with the
    already-exists SQLState swallowed. ``properties`` carries the
    same user/password map the Spark JDBC reader/writer uses —
    without it the Postgres path would fail authentication right
    here, before any table published (r12 review)."""
    jvm = spark._sc._jvm
    props = jvm.java.util.Properties()
    for k, v in (properties or {}).items():
        props.setProperty(k, v)
    conn = jvm.java.sql.DriverManager.getConnection(url, props)
    try:
        stmt = conn.createStatement()
        try:
            stmt.execute(f'CREATE SCHEMA "{schema}"')
        except Exception as exc:  # noqa: BLE001 - inspect the SQLState
            # Derby X0Y68 = object already exists; Postgres 42P06.
            msg = str(exc)
            if "X0Y68" not in msg and "42P06" not in msg and (
                "already exists" not in msg.lower()
            ):
                raise
        finally:
            stmt.close()
    finally:
        conn.close()


def publish_table(
    spark: SparkSession,
    silver_dir: str,
    table: str,
    url: str,
    schema: str | None = None,
    num_partitions: int | None = None,
    properties: dict[str, str] | None = None,
) -> tuple[int, int]:
    """One table of the reference's load loop: truncate-overwrite the
    DB table from the silver parquet, then count-reconcile. Returns
    (rows_silver, rows_db)."""
    df = spark.read.parquet(os.path.join(silver_dir, table))
    qualified = f'"{schema}"."{table}"' if schema else f'"{table}"'
    if num_partitions:
        df = df.repartition(num_partitions)
    overwrite_table(df, url, qualified, properties=properties)
    # Count on the DB side: a subquery dbtable ships ONE row back.
    # read_jdbc(...).count() would scan the whole table over the wire
    # (JDBC v1 does no aggregate pushdown) — ADVICE r12, fixed r13.
    rows_db = int(
        read_jdbc(
            spark,
            url,
            f"(SELECT COUNT(*) AS n FROM {qualified}) q",
            properties=properties,
        ).first()[0]
    )
    return df.count(), rows_db


def publish_silver_to_jdbc(
    spark: SparkSession,
    silver_dir: str,
    url: str,
    tables: list[str] | None = None,
    schema: str | None = None,
    num_partitions: int | None = None,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """The full load phase: every silver table (or the given subset)
    published + reconciled. Returns the reconciliation report the
    reference prints per file (src/main.py:207-216) as a DataFrame:
    (table, rows_silver, rows_db, passed) — ``passed`` is the A13
    count-equality gate; a False row is the reference's ``falhou``."""
    if tables is None:
        tables = sorted(
            d
            for d in os.listdir(silver_dir)
            if not d.startswith((".", "_"))
            and os.path.isdir(os.path.join(silver_dir, d))
        )
    if schema:
        ensure_schema(spark, url, schema, properties=properties)
    rows = []
    for t in tables:
        n_silver, n_db = publish_table(
            spark,
            silver_dir,
            t,
            url,
            schema=schema,
            num_partitions=num_partitions,
            properties=properties,
        )
        rows.append((t, n_silver, n_db, n_silver == n_db))
    return spark.createDataFrame(
        rows,
        "table string, rows_silver bigint, rows_db bigint, passed boolean",
    )
