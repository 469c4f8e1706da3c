"""Deterministic sampling / splitting operators over ``documents``
(training-data pipeline surface, SURVEY.md §2.2 north star).

Everything here must be DETERMINISTIC and ENGINE-PORTABLE — a
train/val/test split that changes between runs (or between the engine
and an auditing tool) silently leaks eval data into training. So no
``rand()``: assignment is keyed on md5 of the stable business key, the
same construction both Spark and DuckDB can evaluate bit-identically
(the d01/t04 fingerprint precedent).

Scale notes: x01 is a pure map + one aggregate (no shuffle before the
agg's partial phase); x02 is one window shuffle on the group key —
both linear, both safe at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rfb_data_pipeline_spark.catalog import load_tables

TRAIN_PCT = 80
VAL_PCT = 10  # test gets the remainder
CAP_PER_SOURCE = 50


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir, tables=("documents",), register_views=False)[
        "documents"
    ]


def _hash_bucket(key: Column, buckets: int = 256) -> Column:
    """0..buckets-1 from the first two hex chars of md5(key) — the
    position-in-alphabet construction (instr) is identical in Spark
    and DuckDB, unlike hex→int casts which differ between dialects."""
    h = F.md5(key.cast("string"))
    hexd = "0123456789abcdef"
    d1 = F.instr(F.lit(hexd), F.substring(h, 1, 1)) - 1
    d2 = F.instr(F.lit(hexd), F.substring(h, 2, 1)) - 1
    return (d1 * 16 + d2) % buckets


def split_col(key: Column) -> Column:
    """'train' / 'val' / 'test' from the hash bucket percentile."""
    pct = (_hash_bucket(key) * 100 / 256).cast("int")
    return (
        F.when(pct < TRAIN_PCT, F.lit("train"))
        .when(pct < TRAIN_PCT + VAL_PCT, F.lit("val"))
        .otherwise(F.lit("test"))
    )


# --------------------------------------------------------------------------
# x01 — deterministic train/val/test assignment + per-split profile.


def x01_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return (
        docs.withColumn("split", split_col(F.col("doc_id")))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
            F.countDistinct("source").alias("n_sources"),
        )
    )


_SQL_BUCKET = (
    "((instr('0123456789abcdef', substr(md5(doc_id::VARCHAR), 1, 1)) - 1) * 16"
    " + (instr('0123456789abcdef', substr(md5(doc_id::VARCHAR), 2, 1)) - 1))"
)

_X01_SQL = f"""
SELECT split, count(*) AS n_docs,
       round(avg(n_chars), 2) AS avg_chars,
       count(DISTINCT source) AS n_sources
FROM (
  SELECT *,
         CASE WHEN CAST({_SQL_BUCKET} * 100 / 256 AS INTEGER) < {TRAIN_PCT} THEN 'train'
              WHEN CAST({_SQL_BUCKET} * 100 / 256 AS INTEGER) < {TRAIN_PCT + VAL_PCT} THEN 'val'
              ELSE 'test' END AS split
  FROM documents
)
GROUP BY split
"""


# --------------------------------------------------------------------------
# x02 — per-group cap (balanced downsampling): keep at most
# CAP_PER_SOURCE docs per source, chosen by the deterministic md5
# order (so re-runs and engines agree on WHICH docs survive).
# The row_number window is one shuffle on source; at 100 TB the same
# shape runs per-partition after a repartition on the group key.


def x02_cap_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    kept = docs.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= CAP_PER_SOURCE
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_chars").alias("sum_chars"),
        F.min("doc_id").alias("min_kept_doc"),
        F.max("doc_id").alias("max_kept_doc"),
    )


_X02_SQL = f"""
SELECT source, count(*) AS n_kept,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       min(doc_id) AS min_kept_doc,
       max(doc_id) AS max_kept_doc
FROM (
  SELECT *,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5(doc_id::VARCHAR), doc_id) AS rk
  FROM documents
)
WHERE rk <= {CAP_PER_SOURCE}
GROUP BY source
"""


QUERIES = {
    "x01_split_assign": x01_split_assign,
    "x02_cap_per_group": x02_cap_per_group,
}

ORACLE = {
    "x01_split_assign": _X01_SQL,
    "x02_cap_per_group": _X02_SQL,
}
