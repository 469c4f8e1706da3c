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


# --------------------------------------------------------------------------
# x03 — stratified sampling: a per-stratum rate (here: keep half the
# English corpus, a quarter of everything else — the downweight-the-
# dominant-language move every multilingual mix does), deterministic
# via the same md5 bucket as x01 so the sample is reproducible and
# auditable. Pure map + one aggregate; no rand(), no second pass.

EN_RATE_BUCKETS = 128  # 128/256 = 50%
OTHER_RATE_BUCKETS = 64  # 64/256 = 25%


def x03_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    bucket = _hash_bucket(F.col("doc_id"))
    threshold = F.when(F.col("lang") == "en", F.lit(EN_RATE_BUCKETS)).otherwise(
        F.lit(OTHER_RATE_BUCKETS)
    )
    sampled = (bucket < threshold).cast("int")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(sampled).alias("n_sampled"),
        F.min(F.when(sampled == 1, F.col("doc_id"))).alias("first_sampled_doc"),
    )


_X03_SQL = f"""
SELECT lang, count(*) AS n_total,
       CAST(sum(sampled) AS BIGINT) AS n_sampled,
       min(CASE WHEN sampled = 1 THEN doc_id END) AS first_sampled_doc
FROM (
  SELECT doc_id, lang,
         CASE WHEN {_SQL_BUCKET} <
                   (CASE WHEN lang = 'en' THEN {EN_RATE_BUCKETS}
                         ELSE {OTHER_RATE_BUCKETS} END)
              THEN 1 ELSE 0 END AS sampled
  FROM documents
)
GROUP BY lang
"""


# --------------------------------------------------------------------------
# x04 — document chunking: overlapping fixed-size token windows (the
# context-window preparation step of an LLM corpus). Each doc yields
# ceil(n/STRIDE) chunks of up to CHUNK_TOKENS tokens with
# CHUNK_TOKENS - STRIDE tokens of overlap. Rows stay narrow: the chunk
# ships as an md5 over its joined tokens plus its size — at pipeline
# scale the text itself is written, but the query surface hashes so
# the driver canon stays scalar. One explode, no shuffle at all until
# a downstream consumer groups.

CHUNK_TOKENS = 32
STRIDE = 24


def x04_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rfb_data_pipeline_spark.operators.text import tokens_col

    docs = _docs(spark, sf_dir)
    toks = tokens_col()
    n = F.size(toks)
    starts = F.sequence(F.lit(0), n - 1, F.lit(STRIDE))
    chunked = docs.select(
        "doc_id", toks.alias("t"), F.explode(starts).alias("s")
    )
    chunk = F.slice(F.col("t"), F.col("s") + 1, CHUNK_TOKENS)
    return chunked.select(
        "doc_id",
        (F.col("s") / STRIDE).cast("int").alias("chunk_idx"),
        F.size(chunk).alias("chunk_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_hash"),
    )


_X04_SQL = f"""
SELECT doc_id,
       CAST(s // {STRIDE} AS INTEGER) AS chunk_idx,
       len(list_slice(t, s + 1, least(s + {CHUNK_TOKENS}, len(t)))) AS chunk_tokens,
       md5(list_aggregate(list_slice(t, s + 1, least(s + {CHUNK_TOKENS}, len(t))),
                          'string_agg', ' ')) AS chunk_hash
FROM (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
), unnest(range(0, len(t), {STRIDE})) AS u(s)
"""


QUERIES = {
    "x01_split_assign": x01_split_assign,
    "x02_cap_per_group": x02_cap_per_group,
    "x03_stratified_sample": x03_stratified_sample,
    "x04_chunk_documents": x04_chunk_documents,
}

ORACLE = {
    "x01_split_assign": _X01_SQL,
    "x02_cap_per_group": _X02_SQL,
    "x03_stratified_sample": _X03_SQL,
    "x04_chunk_documents": _X04_SQL,
}
