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
from rfb_data_pipeline_spark.functions.exactround import (
    ratio_round,
    sql_ratio_round,
)
from rfb_data_pipeline_spark.plans.stage import stage_boundary

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
    """'train' / 'val' / 'test' from the hash bucket percentile.

    The percentile is FLOORED explicitly on both engines: Spark's
    double→int cast truncates while DuckDB's CAST rounds to nearest,
    so the boundary buckets (204 → 79.6875, 230 → 89.84) land in
    different splits under a bare cast — an SF-dependent divergence
    (no doc hashed into those buckets at sf≤0.01; sf0.1 caught it).
    x*100/256 is exact in float64 (denominator is a power of two), so
    floor is deterministic."""
    pct = F.floor(_hash_bucket(key) * 100 / 256).cast("int")
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
            ratio_round(
                F.sum("n_chars"), F.count("n_chars"), 2
            , nonneg=True).alias("avg_chars"),
            F.countDistinct("source").alias("n_sources"),
        )
    )


_SQL_BUCKET = (
    "((instr('0123456789abcdef', substr(md5(doc_id::VARCHAR), 1, 1)) - 1) * 16"
    " + (instr('0123456789abcdef', substr(md5(doc_id::VARCHAR), 2, 1)) - 1))"
)

_X01_SQL = f"""
SELECT split, count(*) AS n_docs,
       {sql_ratio_round('sum(n_chars)', 'count(n_chars)', 2, nonneg=True)} AS avg_chars,
       count(DISTINCT source) AS n_sources
FROM (
  SELECT *,
         CASE WHEN CAST(floor({_SQL_BUCKET} * 100.0 / 256) AS INTEGER) < {TRAIN_PCT} THEN 'train'
              WHEN CAST(floor({_SQL_BUCKET} * 100.0 / 256) AS INTEGER) < {TRAIN_PCT + VAL_PCT} THEN 'val'
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


# --------------------------------------------------------------------------
# x05 — end-to-end corpus curation funnel: the composed pipeline every
# LLM corpus runs before training — exact dedup, quality gate,
# benchmark decontamination — reported as a per-source funnel so each
# stage's cost is auditable. Stages are FLAGS on one pass over the
# corpus (not three materialized intermediates): dedup survivorship is
# one window over the text fingerprint, quality is a pure map (t02's
# rules), contamination is the d08 broadcast semi-join — so the whole
# funnel costs one wide table scan + one narrow shingle pass
# regardless of how many stages report.

EVAL_MOD = 97  # doc_id % 97 == 0 → held-out benchmark slice (as d08)


def x05_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rfb_data_pipeline_spark.operators.dedup import _doc_shingles_cached
    from rfb_data_pipeline_spark.operators.text import quality_gate, tokens_col

    docs = _docs(spark, sf_dir)
    corpus = docs.filter(F.col("doc_id") % EVAL_MOD != 0)

    # Stage 1 — exact dedup: the min-doc_id representative of each
    # exact-text group survives (one shuffle on the fingerprint).
    w = Window.partitionBy(F.md5(F.col("text")))
    keep_dedup = (F.col("doc_id") == F.min("doc_id").over(w)).cast("int")

    # Stage 2 — quality gate (t02's Gopher/C4-style rules, pure map;
    # one copy, text.quality_gate).
    n_tokens = F.size(tokens_col())
    quality = quality_gate().cast("int")

    # Stage 3 — decontamination: any 3-gram shared with the held-out
    # slice taints the doc (d08's broadcast-able semi-join shape).
    # r13: the session-memoized shingle table (identical frame — the
    # memo IS _doc_shingles over these docs) instead of re-exploding
    # the corpus per invocation, matching d08 (guide §2.4).
    sh = _doc_shingles_cached(spark, sf_dir)
    eval_sh = (
        sh.filter(F.col("doc_id") % EVAL_MOD == 0).select("shingle").distinct()
    )
    contaminated = (
        sh.filter(F.col("doc_id") % EVAL_MOD != 0)
        .join(F.broadcast(eval_sh), "shingle", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("contam", F.lit(1))
    )

    flagged = (
        corpus.withColumn("keep_dedup", keep_dedup)
        .withColumn("quality", quality)
        .withColumn("n_tokens", n_tokens)
        .join(contaminated, "doc_id", "left")
        .withColumn("clean", F.coalesce(1 - F.col("contam"), F.lit(1)))
    )
    kept = F.col("keep_dedup") * F.col("quality") * F.col("clean")
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_input"),
        F.sum("keep_dedup").alias("n_after_dedup"),
        F.sum(F.col("keep_dedup") * F.col("quality")).alias("n_after_quality"),
        F.sum(kept).alias("n_kept"),
        F.sum(F.col("n_tokens") * kept).alias("tokens_kept"),
    )


_X05_SQL = f"""
WITH corpus AS (
  SELECT *, string_split_regex(trim(text), '\\s+') AS toks,
         CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY md5(text))
              THEN 1 ELSE 0 END AS keep_dedup
  FROM documents WHERE doc_id % {EVAL_MOD} <> 0
),
sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           range(1, len(t) - 1),
           i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]))) AS shingle
  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents)
),
eval_sh AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % {EVAL_MOD} = 0),
contam AS (
  SELECT DISTINCT doc_id FROM sh
  WHERE doc_id % {EVAL_MOD} <> 0 AND shingle IN (SELECT shingle FROM eval_sh)
),
flagged AS (
  SELECT c.source, c.keep_dedup, len(c.toks) AS n_tokens,
         CASE WHEN len(c.toks) >= 10
               AND len(list_filter(c.toks,
                     t -> t IN ('the','a','of','to','and','in','is','it')))::DOUBLE
                   / len(c.toks) >= 0.01
               AND length(regexp_replace(c.text, '[^0-9]', '', 'g'))::DOUBLE
                   / greatest(length(c.text), 1) <= 0.3
              THEN 1 ELSE 0 END AS quality,
         CASE WHEN ct.doc_id IS NULL THEN 1 ELSE 0 END AS clean
  FROM corpus c LEFT JOIN contam ct ON c.doc_id = ct.doc_id
)
SELECT source,
       count(*) AS n_input,
       CAST(sum(keep_dedup) AS BIGINT) AS n_after_dedup,
       CAST(sum(keep_dedup * quality) AS BIGINT) AS n_after_quality,
       CAST(sum(keep_dedup * quality * clean) AS BIGINT) AS n_kept,
       CAST(sum(n_tokens * keep_dedup * quality * clean) AS BIGINT)
         AS tokens_kept
FROM flagged
GROUP BY source
"""


# --------------------------------------------------------------------------
# x06 — deterministic corpus shuffle + shard export: the final step of
# training-data preparation. A global "sort by random key then round-
# robin" permutation needs a global total order (single point of
# coordination); the scalable equivalent used here is hash-bucket
# shard assignment + md5-ordered placement WITHIN each shard — the
# composition is still a uniform pseudorandom permutation of the
# corpus, but every shard is built independently (one shuffle on the
# shard key, then a per-shard sort that Spark runs partition-local).
# The order_checksum (sum of rank x doc_id) pins the exact within-
# shard sequence cross-engine, so the oracle verifies the full
# permutation, not just membership.

N_SHARDS = 8


def x06_shuffle_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    shard = (_hash_bucket(F.col("doc_id")) % N_SHARDS).alias("shard")
    skey = F.md5(F.col("doc_id").cast("string"))
    sharded = docs.select("doc_id", "n_chars", shard, skey.alias("skey"))
    w = Window.partitionBy("shard").orderBy("skey", "doc_id")
    ranked = sharded.withColumn("rk", F.row_number().over(w))
    return ranked.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.min_by("doc_id", F.col("skey")).alias("first_doc"),
        F.sum(F.col("rk").cast("bigint") * F.col("doc_id")).alias(
            "order_checksum"
        ),
    )


_X06_SQL = f"""
SELECT shard,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       min_by(doc_id, skey) AS first_doc,
       CAST(sum(rk * doc_id) AS BIGINT) AS order_checksum
FROM (
  SELECT doc_id, n_chars, shard, skey,
         row_number() OVER (PARTITION BY shard ORDER BY skey, doc_id) AS rk
  FROM (
    SELECT doc_id, n_chars,
           {_SQL_BUCKET} % {N_SHARDS} AS shard,
           md5(doc_id::VARCHAR) AS skey
    FROM documents
  )
)
GROUP BY shard
"""


# --------------------------------------------------------------------------
# x09 — token-budget sequence packing (concatenate-then-chunk): docs
# are concatenated in the deterministic md5 shuffle order (x06's
# construction) and each doc belongs to the ~BUDGET-token pack where
# it STARTS: pack_id = floor(start_offset / BUDGET) with
# start_offset = running token sum minus own length — the standard
# pretraining batch-prep step (a pack's last doc may overflow the
# budget; the trainer truncates at the boundary).
#
# Scale: the corpus-wide running sum is a two-phase parallel prefix
# sum (same pattern as e14's concurrency sweep), NOT one global
# Window.orderBy — that shape sorts the whole corpus through a single
# task. Band = first 2 hex chars of skey (256 uniform bands, and a
# prefix of the sort key, so per-band order + band order == global
# order). Phase 1: per-band local running sums (parallel window).
# Phase 2: 256-row band-total frame gets cumulative offsets (driver-
# scale window), broadcast back. global_running = band_offset +
# local_running. At 100 TB widen the band prefix to 3-4 hex chars.

PACK_BUDGET = 2048
# Band prefix width (hex chars of skey): 16**k bands. Sizing rule for
# the two-phase prefix sum: the band-offset frame is 16**k rows and
# must stay driver/broadcast-scale, while each band should hold
# ~(corpus rows / 16**k) ≲ a few million rows so the per-band window
# fits one task. sf0.1 (60k docs): k=2 (256 bands). 100 TB
# (~1e10 docs): k=4 (65,536 bands, ~150k docs/band — offsets still a
# trivially broadcastable 65k-row frame).
PACK_BAND_HEX = 2


def x09_pack_sequences(
    spark: SparkSession,
    sf_dir: str,
    pack_budget: int = PACK_BUDGET,
    band_hex: int = PACK_BAND_HEX,
) -> DataFrame:
    from rfb_data_pipeline_spark.operators.text import tokens_col

    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.size(tokens_col()).alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("skey"),
    ).withColumn("band", F.substring("skey", 1, band_hex))
    wb = (
        Window.partitionBy("band")
        .orderBy("skey", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = docs.withColumn("local_running", F.sum("n_tokens").over(wb))
    band_offsets = (
        docs.groupBy("band")
        .agg(F.sum("n_tokens").alias("band_total"))
        .withColumn(
            "band_offset",
            F.coalesce(
                F.sum("band_total").over(
                    Window.orderBy("band").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("band", "band_offset")
    )
    packed = local.join(F.broadcast(band_offsets), "band").select(
        "doc_id",
        "n_tokens",
        F.floor(
            (F.col("band_offset") + F.col("local_running") - F.col("n_tokens"))
            / pack_budget
        ).alias("pack_id"),
    )
    return packed.groupBy("pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("sum_tokens"),
        F.min("doc_id").alias("first_doc"),
    )


_X09_SQL = f"""
SELECT pack_id, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
       min(doc_id) AS first_doc
FROM (
  SELECT doc_id, n_tokens,
         CAST(floor((sum(n_tokens) OVER (ORDER BY skey, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     - n_tokens) / {PACK_BUDGET}) AS BIGINT) AS pack_id
  FROM (
    SELECT doc_id,
           len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
           md5(doc_id::VARCHAR) AS skey
    FROM documents
  )
)
GROUP BY pack_id
"""


# --------------------------------------------------------------------------
# x08 — split-leakage audit: near-duplicate pairs that STRADDLE
# train/val/test. A hash split (x01) is doc-level, so near-dups of a
# training doc can land in test and leak eval signal — the audit every
# dedup-aware corpus build runs before shipping a split. Composes the
# exact near-dup pairs (d02, the verifier tier; at 100 TB the d03 LSH
# candidates feed the same join) with the split map: two key joins +
# one small aggregate, no new shuffle shapes.


def x08_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rfb_data_pipeline_spark.operators.dedup import d02_ngram_jaccard

    pairs = d02_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    splits = _docs(spark, sf_dir).select(
        "doc_id", split_col(F.col("doc_id")).alias("split")
    )
    a = splits.select(
        F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a")
    )
    b = splits.select(
        F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b")
    )
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .groupBy(
            F.least("split_a", "split_b").alias("split_lo"),
            F.greatest("split_a", "split_b").alias("split_hi"),
        )
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .select(
            "split_lo",
            "split_hi",
            "n_pairs",
            (F.col("split_lo") != F.col("split_hi")).cast("int").alias("is_leak"),
        )
    )


def _x08_sql() -> str:
    from rfb_data_pipeline_spark.operators.dedup import _D02_SQL

    return f"""
WITH pairs AS ({_D02_SQL}),
splits AS (
  SELECT doc_id,
         CASE WHEN CAST(floor({_SQL_BUCKET} * 100.0 / 256) AS INTEGER) < {TRAIN_PCT} THEN 'train'
              WHEN CAST(floor({_SQL_BUCKET} * 100.0 / 256) AS INTEGER) < {TRAIN_PCT + VAL_PCT} THEN 'val'
              ELSE 'test' END AS split
  FROM documents
)
SELECT split_lo, split_hi, n_pairs,
       CASE WHEN split_lo <> split_hi THEN 1 ELSE 0 END AS is_leak
FROM (
  SELECT least(sa.split, sb.split) AS split_lo,
         greatest(sa.split, sb.split) AS split_hi,
         count(*) AS n_pairs
  FROM pairs
  JOIN splits sa ON pairs.doc_a = sa.doc_id
  JOIN splits sb ON pairs.doc_b = sb.doc_id
  GROUP BY 1, 2
)
"""


# --------------------------------------------------------------------------
# x07 — SCD-1 upsert merge (last-writer-wins MERGE INTO semantics).
#
# The reference's load is TRUNCATE-then-reload (src/main.py:200); the
# incremental path a warehouse actually needs is an upsert: a change
# batch keyed like the base table replaces matching rows and appends
# the rest. Expressed Spark-first as union + one row_number window on
# the merge key — a single shuffle on o_orderkey; at 100 TB the same
# plan, with the base side pre-bucketed on the key, merges without
# re-sorting the full table. The change batch is derived
# deterministically here (every o_orderkey ending in 00..09 flips to
# status 'U') so both engines construct the identical delta.


def x07_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(
        spark, sf_dir, tables=("orders",), register_views=False
    )["orders"]
    base = orders.select(
        "o_orderkey", "o_orderstatus", "o_totalprice", F.lit(1).alias("version")
    )
    delta = (
        orders.filter(F.col("o_orderkey") % 100 < 10)
        .select(
            "o_orderkey",
            F.lit("U").alias("o_orderstatus"),
            (F.col("o_totalprice") + 1.0).alias("o_totalprice"),
            F.lit(2).alias("version"),
        )
    )
    win = Window.partitionBy("o_orderkey").orderBy(F.desc("version"))
    merged = (
        base.unionByName(delta)
        .withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") == 1)
    )
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


_X07_SQL = """
WITH base AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice, 1 AS version FROM orders
),
delta AS (
  SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice + 1.0 AS o_totalprice,
         2 AS version
  FROM orders WHERE o_orderkey % 100 < 10
),
merged AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY o_orderkey ORDER BY version DESC) AS rn
    FROM (SELECT * FROM base UNION ALL SELECT * FROM delta)
  ) WHERE rn = 1
)
SELECT o_orderstatus, count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS sum_price
FROM merged GROUP BY o_orderstatus
"""


# --------------------------------------------------------------------------
# x10 — domain-mixture selection (data mixing): resample the corpus to
# a TARGET language mixture, exactly and deterministically.
#
# Mixture weights are INTEGER parts (en:2, de:1, ... of P=6) so every
# boundary is integer arithmetic — no float quota can round apart
# across engines. The achievable total is T = min_s floor(n_s * P /
# p_s) (the largest corpus where no domain over-draws its supply);
# each domain's quota is floor(p_s * T / P), and the quota is filled
# by the p_s*T/P docs with the SMALLEST md5(doc_id) in that domain —
# a deterministic, auditable selection (the x01 no-rand() rule).
#
# Scale: the per-domain rank is the BANDED two-phase form (q29/x09
# family) — rows band on the first hex char of the sort key, rank
# locally within (lang, band), and add broadcast per-band offsets;
# the corpus-scale window is partitioned |langs|x16 ways, never one
# task per domain. The quota frame is |langs| rows, broadcast.


MIX_PARTS = {"en": 2, "de": 1, "es": 1, "fr": 1, "zh": 1}
MIX_TOTAL = sum(MIX_PARTS.values())
# Band prefix width for the per-domain rank: |langs| * 16**k window
# partitions. 100 TB sizing follows x09's rule — pick k so each
# (lang, band) cell holds ≲ a few million rows; the offset frame stays
# |langs| * 16**k rows (broadcast-scale even at k=4).
MIX_BAND_HEX = 1


def _mix_quotas(docs: DataFrame, mix_parts: dict[str, int]) -> DataFrame:
    """(lang, n_available, quota) — x10's exact integer-part quota
    formula, ONE copy shared with x16."""
    mix_total = sum(mix_parts.values())
    parts = F.create_map(*[F.lit(x) for kv in mix_parts.items() for x in kv])
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_available"))
    total = counts.agg(
        F.min(
            F.floor(F.col("n_available") * mix_total / parts[F.col("lang")])
        ).alias("t_max")
    )
    return counts.crossJoin(F.broadcast(total)).select(
        "lang",
        "n_available",
        F.floor(parts[F.col("lang")] * F.col("t_max") / mix_total).alias(
            "quota"
        ),
    )


def _banded_quota_select(docs: DataFrame, quotas: DataFrame) -> DataFrame:
    """Top-quota rows per lang via the banded two-phase rank — ONE
    copy of the offset/rank machinery (x10 and x16). ``docs`` must
    carry (doc_id, lang, skey, band) where ``band`` is a MONOTONE
    PREFIX of the (skey, doc_id) sort order — that property is what
    licenses replacing the per-lang global rank with per-(lang, band)
    local ranks plus cumulative band offsets."""
    wb = Window.partitionBy("lang", "band").orderBy("skey", "doc_id")
    local = docs.withColumn("local_rn", F.row_number().over(wb))
    offsets = (
        docs.groupBy("lang", "band")
        .agg(F.count(F.lit(1)).alias("band_n"))
        .withColumn(
            "band_offset",
            F.coalesce(
                F.sum("band_n").over(
                    Window.partitionBy("lang")
                    .orderBy("band")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("lang", "band", "band_offset")
    )
    return (
        local.join(F.broadcast(offsets), ["lang", "band"])
        .join(F.broadcast(quotas), "lang")
        .filter(F.col("band_offset") + F.col("local_rn") <= F.col("quota"))
    )


def x10_domain_mixture(
    spark: SparkSession,
    sf_dir: str,
    mix_parts: dict[str, int] | None = None,
    band_hex: int = MIX_BAND_HEX,
) -> DataFrame:
    mix_parts = MIX_PARTS if mix_parts is None else mix_parts
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        "lang",
        F.md5(F.col("doc_id").cast("string")).alias("skey"),
    ).withColumn("band", F.substring("skey", 1, band_hex))
    selected = _banded_quota_select(docs, _mix_quotas(docs, mix_parts))
    return selected.groupBy("lang").agg(
        F.max("n_available").alias("n_available"),
        F.max("quota").cast("bigint").alias("quota"),
        F.count(F.lit(1)).alias("n_selected"),
        F.sum("doc_id").alias("sel_checksum"),
    )


def _x10_parts_sql() -> str:
    return (
        "CASE lang "
        + " ".join(f"WHEN '{k}' THEN {v}" for k, v in MIX_PARTS.items())
        + " END"
    )


_X10_SQL = f"""
WITH counts AS (
  SELECT lang, count(*) AS n_available FROM documents GROUP BY lang
),
total AS (
  SELECT min(CAST(floor(n_available * {MIX_TOTAL} / ({_x10_parts_sql()})) AS BIGINT))
           AS t_max
  FROM counts
),
quotas AS (
  SELECT lang, n_available,
         CAST(floor(({_x10_parts_sql()}) * t_max / {MIX_TOTAL}) AS BIGINT) AS quota
  FROM counts, total
),
ranked AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5(doc_id::VARCHAR), doc_id) AS rn
  FROM documents
)
SELECT r.lang, q.n_available, q.quota,
       count(*) AS n_selected,
       CAST(sum(r.doc_id) AS BIGINT) AS sel_checksum
FROM ranked r JOIN quotas q ON r.lang = q.lang
WHERE r.rn <= q.quota
GROUP BY r.lang, q.n_available, q.quota
"""


# --------------------------------------------------------------------------
# x11 — curriculum quality buckets: rank every document on a composite
# quality score and cut the ranking into CURRICULUM_BUCKETS equal-depth
# tiers (bucket 1 = highest quality). Curriculum / quality-annealed
# training consumes exactly this assignment — highest tier last, or
# tier-weighted sampling — so the operator reports the per-tier doc and
# token budget a scheduler would feed from.
#
# Scale shape: an exact equal-depth cut needs a TOTAL order, but a
# global-sort window would funnel the corpus through one partition — so
# the global rank is the q29/x09 banded two-phase prefix-sum: score-
# range bands rank locally in parallel, a constant-size (X11_BANDS-row)
# offset frame stitches them, and ntile math converts rank → bucket.
# The only single-partition frame is the band-offset table.

CURRICULUM_BUCKETS = 4
X11_BANDS = 32


def x11_curriculum_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rfb_data_pipeline_spark.operators.text import STOPWORDS_EN, tokens_col

    docs = _docs(spark, sf_dir)
    toks = tokens_col()
    nt = F.size(toks).cast("double")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS_EN])
    uniq_ratio = F.size(F.array_distinct(toks)).cast("double") / nt
    stop_ratio = (
        F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))).cast(
            "double"
        )
        / nt
    )
    len_norm = F.least(nt / F.lit(100.0), F.lit(1.0))
    # fixed evaluation order — bit-identical in both engines, so the
    # total order (score DESC, doc_id) is identical too
    score = (
        F.lit(0.5) * uniq_ratio + F.lit(0.3) * stop_ratio + F.lit(0.2) * len_norm
    )
    # Materialized once: the scored frame feeds three branches (bounds,
    # local ranks, band offsets) and the tokenize+score map is the
    # heaviest stage — without the checkpoint the corpus is scanned and
    # scored twice (the d02/d13 stage-boundary idiom).
    # EAGER boundary kept (r14): a lazy boundary was prototyped and
    # measured SLOWER here (paired ABAB 0.70 eager vs 0.75-0.85 lazy)
    # — scored feeds TWO separate broadcast builds (bounds, offsets)
    # whose driver-side jobs can race the cache materialization and
    # recompute the tokenize+score lineage; the eager checkpoint
    # guarantees every consumer reads cached blocks. x16/e17/e22 keep
    # the lazy form (single non-racing first consumer, measured
    # faster; see OPTIMIZATION_r14.md).
    scored = docs.select(
        "doc_id", F.size(toks).alias("n_tokens"), score.alias("score")
    ).transform(stage_boundary)

    bounds = scored.agg(
        F.min("score").alias("_lo"),
        F.max("score").alias("_hi"),
        F.count(F.lit(1)).alias("_n"),
    )
    span = F.col("_hi") - F.col("_lo")
    banded = scored.join(F.broadcast(bounds)).withColumn(
        "_band",
        F.when(span == 0, F.lit(0)).otherwise(
            F.least(
                F.lit(X11_BANDS - 1),
                F.floor((F.col("_hi") - F.col("score")) * X11_BANDS / span),
            )
        ),
    )
    wb = Window.partitionBy("_band").orderBy(F.desc("score"), F.asc("doc_id"))
    local = banded.withColumn("_local_rn", F.row_number().over(wb))
    offsets = (
        banded.groupBy("_band")
        .agg(F.count(F.lit(1)).alias("_band_n"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_band_n").over(
                    Window.orderBy("_band").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("_band", "_offset")
    )
    rank = F.col("_offset") + F.col("_local_rn")
    k = F.lit(CURRICULUM_BUCKETS)
    q, r = F.floor(F.col("_n") / k), F.col("_n") % k
    bucket = F.when(rank <= r * (q + 1), F.ceil(rank / (q + 1))).otherwise(
        r + F.ceil((rank - r * (q + 1)) / F.when(q == 0, 1).otherwise(q))
    )
    return (
        local.join(F.broadcast(offsets), "_band")
        .withColumn("bucket", bucket.cast("int"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
            (F.round(F.avg("score"), 4) + F.lit(0.0)).alias("avg_score"),
            (F.round(F.min("score"), 4) + F.lit(0.0)).alias("min_score"),
            (F.round(F.max("score"), 4) + F.lit(0.0)).alias("max_score"),
        )
    )


def _x11_stop_sql() -> str:
    from rfb_data_pipeline_spark.operators.text import STOPWORDS_EN

    vals = ",".join(f"'{s}'" for s in STOPWORDS_EN)
    return f"len(list_filter(toks, t -> t IN ({vals})))::DOUBLE"


_X11_SQL = f"""
WITH scored AS (
  SELECT doc_id, len(toks) AS n_tokens,
         0.5 * (len(list_distinct(toks))::DOUBLE / len(toks)::DOUBLE)
         + 0.3 * ({{STOP}} / len(toks)::DOUBLE)
         + 0.2 * least(len(toks)::DOUBLE / 100.0, 1.0) AS score
  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
        FROM documents)
),
b AS (
  SELECT *, ntile({CURRICULUM_BUCKETS})
              OVER (ORDER BY score DESC, doc_id ASC) AS bucket
  FROM scored
)
SELECT bucket, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
       round(avg(score), 4) + 0.0 AS avg_score,
       round(min(score), 4) + 0.0 AS min_score,
       round(max(score), 4) + 0.0 AS max_score
FROM b GROUP BY bucket
"""


# --------------------------------------------------------------------------
# x12 — repetition gate (the Gopher/RefinedWeb document filter that
# CONSUMES d14 + t07): a document is dropped when its cross-doc
# duplicated-span fraction (d14) or its intra-doc repetition signals
# (t07's duplicate-bigram / top-token fractions) exceed thresholds.
# This closes the loop from repetition *metrics* to the curation
# *decision* — reported per source so the gate's cost is auditable,
# with kept-token totals (what actually reaches training).
#
# Reuses the d14 and t07 operators verbatim (their outputs are
# hash-green, so threshold comparisons on their rounded fractions are
# engine-identical by construction). Plan: the span-table aggs (d14)
# + the token aggs (t07) + one doc-keyed join layer + a small
# per-source aggregate — every shuffle is keyed on doc_id or a hash,
# linear at 100 TB. Docs shorter than d13's span window have no
# cross-doc row → coalesce(0): short docs can't span-duplicate.

REP_MAX_CROSS_DUP = 0.2
REP_MAX_DUP_BIGRAM = 0.3
REP_MAX_TOP_TOKEN = 0.2


def x12_repetition_gate(
    spark: SparkSession,
    sf_dir: str,
    max_cross_dup: float = REP_MAX_CROSS_DUP,
    max_dup_bigram: float = REP_MAX_DUP_BIGRAM,
    max_top_token: float = REP_MAX_TOP_TOKEN,
) -> DataFrame:
    from rfb_data_pipeline_spark.operators.dedup import d14_dup_span_fraction
    from rfb_data_pipeline_spark.operators.text import t07_repetition

    from rfb_data_pipeline_spark.operators.text import tokens_col

    intra = t07_repetition(spark, sf_dir).select(
        "doc_id", "top_token_frac", "dup_bigram_frac"
    )
    cross = d14_dup_span_fraction(spark, sf_dir).select("doc_id", "dup_frac")
    # Every document is audited — n_tokens is computed inline so docs
    # too short for t07 (no bigram: <2 non-empty tokens) still count
    # in n_docs/n_kept instead of silently vanishing from the funnel
    # denominator. Missing intra/cross signals coalesce to "cannot
    # measure repetition on this doc" = not flagged.
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        "source",
        # coalesce(0): NULL text → 0 tokens, matching the SQL twin's
        # coalesce(dt.n_tokens, 0) — a NULL here would silently drop
        # the doc from tokens_kept while still counting it in n_docs
        F.coalesce(
            F.size(F.filter(tokens_col(), lambda t: F.length(t) > 0)),
            F.lit(0),
        ).alias("n_tokens"),
    )
    joined = (
        docs.join(intra, "doc_id", "left").join(cross, "doc_id", "left")
    )
    cross_frac = F.coalesce(F.col("dup_frac"), F.lit(0.0))
    flag_cross = (cross_frac > max_cross_dup).cast("int")
    flag_intra = (
        (F.coalesce(F.col("dup_bigram_frac"), F.lit(0.0)) > max_dup_bigram)
        | (F.coalesce(F.col("top_token_frac"), F.lit(0.0)) > max_top_token)
    ).cast("int")
    kept = ((flag_cross + flag_intra) == 0).cast("int")
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(flag_cross).alias("n_flag_cross"),
        F.sum(flag_intra).alias("n_flag_intra"),
        F.sum(kept).alias("n_kept"),
        F.sum(F.col("n_tokens") * kept).alias("tokens_kept"),
    )


def _x12_sql() -> str:
    from rfb_data_pipeline_spark.operators.dedup import _SPANS_CTE

    return f"""
WITH {_SPANS_CTE},
dupset AS (
  SELECT span_hash FROM spans
  GROUP BY span_hash HAVING count(DISTINCT doc_id) >= 2
),
per_doc_spans AS (
  SELECT doc_id, count(*) AS n_spans FROM spans GROUP BY doc_id
),
per_doc_dup AS (
  SELECT doc_id, count(*) AS n_dup FROM spans
  WHERE span_hash IN (SELECT span_hash FROM dupset)
  GROUP BY doc_id
),
cross_frac AS (
  SELECT p.doc_id,
         round(coalesce(d.n_dup, 0)::DOUBLE / p.n_spans, 4) + 0.0 AS dup_frac
  FROM per_doc_spans p LEFT JOIN per_doc_dup d USING (doc_id)
),
tk AS (
  SELECT doc_id, u.i AS pos, t[u.i] AS w
  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
        FROM documents),
       unnest(range(1, len(t) + 1)) AS u(i)
  WHERE length(t[u.i]) > 0
),
per_doc_tok AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens, max(c) AS max_tok
  FROM (SELECT doc_id, w, count(*) AS c FROM tk GROUP BY 1, 2)
  GROUP BY doc_id
),
bigrams AS (
  SELECT doc_id, count(*) AS n_bigrams,
         count(DISTINCT bg) AS n_unique_bigrams
  FROM (
    SELECT doc_id,
           w || ' ' || lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS bg,
           lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w1
    FROM tk
  ) WHERE w1 IS NOT NULL
  GROUP BY doc_id
),
intra AS (
  SELECT doc_id, n_tokens,
         round(max_tok::DOUBLE / n_tokens, 4) AS top_token_frac,
         round(1 - n_unique_bigrams::DOUBLE / n_bigrams, 4) AS dup_bigram_frac
  FROM per_doc_tok JOIN bigrams USING (doc_id)
),
doc_tok AS (
  SELECT doc_id, count(*) AS n_tokens FROM tk GROUP BY doc_id
),
flags AS (
  SELECT dd.source, coalesce(dt.n_tokens, 0) AS n_tokens,
         CASE WHEN coalesce(c.dup_frac, 0.0) > {REP_MAX_CROSS_DUP}
              THEN 1 ELSE 0 END AS flag_cross,
         CASE WHEN coalesce(i.dup_bigram_frac, 0.0) > {REP_MAX_DUP_BIGRAM}
                OR coalesce(i.top_token_frac, 0.0) > {REP_MAX_TOP_TOKEN}
              THEN 1 ELSE 0 END AS flag_intra
  FROM documents dd
  LEFT JOIN doc_tok dt ON dd.doc_id = dt.doc_id
  LEFT JOIN intra i ON dd.doc_id = i.doc_id
  LEFT JOIN cross_frac c ON dd.doc_id = c.doc_id
)
SELECT source, count(*) AS n_docs,
       CAST(sum(flag_cross) AS BIGINT) AS n_flag_cross,
       CAST(sum(flag_intra) AS BIGINT) AS n_flag_intra,
       CAST(sum(CASE WHEN flag_cross + flag_intra = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_kept,
       CAST(sum(n_tokens * CASE WHEN flag_cross + flag_intra = 0
                                THEN 1 ELSE 0 END) AS BIGINT) AS tokens_kept
FROM flags
GROUP BY source
"""


# --------------------------------------------------------------------------
# x13 — deterministic WEIGHTED sampling without replacement
# (Efraimidis–Spirakis): each doc draws key = ln(u)/w with u a
# deterministic md5-derived uniform and w its weight (chars here; a
# quality score in production); the K largest keys are the sample.
# P(selected) ∝ w — the importance-sampling primitive behind
# quality-weighted data mixing — yet fully reproducible and
# engine-identical: u comes from 12 md5 hex digits (48 bits, exact in
# float64), never rand().
#
# Scale: key assignment is a pure map; top-K is orderBy().limit()
# (distributed TakeOrdered — each task ships K rows, no global sort).
# At 100 TB with per-stratum quotas, swap the global limit for the
# x02 per-group window or the x10 banded rank — same key column.

WEIGHTED_K = 100
_U_DIGITS = 12


def _uniform_from_md5(col: Column) -> Column:
    """(0,1] uniform from the first 12 md5 hex digits — built from the
    same instr() digit walk both engines share (x01's bucket idiom
    widened to 48 bits). +1 in the numerator avoids u=0 (ln(0))."""
    h = F.md5(col.cast("string"))
    hexd = "0123456789abcdef"
    acc = F.lit(0).cast("double")
    for i in range(1, _U_DIGITS + 1):
        digit = F.instr(F.lit(hexd), F.substring(h, i, 1)) - 1
        acc = acc + digit * float(16 ** (_U_DIGITS - i))
    return (acc + 1) / float(16**_U_DIGITS)


def _uniform_sql(expr: str) -> str:
    terms = " + ".join(
        f"(instr('0123456789abcdef', substr(md5({expr}), {i}, 1)) - 1)"
        f" * {float(16 ** (_U_DIGITS - i))}"
        for i in range(1, _U_DIGITS + 1)
    )
    return f"(({terms}) + 1) / {float(16 ** _U_DIGITS)}"


def x13_weighted_sample(
    spark: SparkSession, sf_dir: str, k: int = WEIGHTED_K
) -> DataFrame:
    docs = _docs(spark, sf_dir)
    # ROUNDED key (repo float discipline, s11 precedent): ln() is only
    # 1-ulp-accurate and libm implementations differ, so an unrounded
    # rank could flip a boundary selection between engines; 12 decimals
    # crushes ulp noise, doc_id breaks any tie deterministically.
    key = F.round(
        F.log(_uniform_from_md5(F.col("doc_id"))) / F.col("n_chars"), 12
    )
    # weight <= 0 (empty/NULL doc) ⇒ selection probability 0 in
    # Efraimidis-Spirakis — excluded up front, identically in the SQL
    # twin, instead of an ANSI divide-by-zero (degenerate-corpus probe)
    sample = (
        docs.filter(F.col("n_chars") > 0)
        .select("doc_id", "lang", "n_chars", key.alias("skey"))
        .orderBy(F.desc("skey"), F.asc("doc_id"))
        .limit(k)
    )
    return sample.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_selected"),
        F.sum("n_chars").alias("chars_selected"),
        F.sum("doc_id").alias("sel_checksum"),
    )


def _x13_sql() -> str:
    return f"""
SELECT lang, count(*) AS n_selected,
       CAST(sum(n_chars) AS BIGINT) AS chars_selected,
       CAST(sum(doc_id) AS BIGINT) AS sel_checksum
FROM (
  SELECT doc_id, lang, n_chars,
         round(ln({_uniform_sql('doc_id::VARCHAR')}) / n_chars, 12) AS skey
  FROM documents
  WHERE n_chars > 0
  ORDER BY skey DESC, doc_id ASC
  LIMIT {WEIGHTED_K}
)
GROUP BY lang
"""


# --------------------------------------------------------------------------
# x14 — epoch/repeat-factor planning (the data-constrained-scaling
# step that precedes x10's selection): given a train-token BUDGET and
# a target domain mixture, how many epochs of each domain does the
# plan imply, and which domains exceed the useful-repetition limit
# (~4 epochs — past that, repeated data's value decays sharply;
# Muennighoff et al. 2023, "Scaling Data-Constrained Language
# Models")? Production pipelines run exactly this arithmetic to decide
# whether to relax dedup, widen crawls, or rebalance the mixture
# before committing a training run.
#
# Scale: one corpus aggregate (token counts per domain — no explode,
# a per-row size(split) map) + constant-size frames. All-integer
# until the final division; the epoch flag compares the ROUNDED value
# so both engines decide identically.

EPOCH_BUDGET_MULT = 3  # token budget as a multiple of total corpus tokens
MAX_GOOD_EPOCHS = 4.0


def x14_epoch_plan(
    spark: SparkSession,
    sf_dir: str,
    mix_parts: dict[str, int] | None = None,
    budget_mult: int = EPOCH_BUDGET_MULT,
) -> DataFrame:
    mix_parts = MIX_PARTS if mix_parts is None else mix_parts
    mix_total = sum(mix_parts.values())
    parts = F.create_map(*[F.lit(x) for kv in mix_parts.items() for x in kv])
    docs = _docs(spark, sf_dir).select(
        "lang", F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("ntok")
    )
    per = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("ntok").alias("n_tokens")
    )
    total = per.agg(F.sum("n_tokens").alias("corpus_tokens"))
    # floor(x*100+0.5)/100, not round(x, 2): the ratio of two integers
    # CAN land exactly on a .xx5 tie and the engines' round() disagrees
    # on ties (the s07 precedent) — this spelling is identical IEEE
    # arithmetic on both sides
    epochs = (
        F.floor(
            F.col("target_tokens").cast("double") / F.col("n_tokens") * 100
            + F.lit(0.5)
        )
        / F.lit(100.0)
    )
    # languages outside the mixture get part 0 (present in the corpus,
    # absent from the plan) — not NULL arithmetic
    part = F.coalesce(parts[F.col("lang")], F.lit(0))
    return (
        per.crossJoin(F.broadcast(total))
        .select(
            "lang",
            "n_docs",
            "n_tokens",
            part.cast("int").alias("mix_part"),
            F.floor(
                F.col("corpus_tokens") * budget_mult * part / mix_total
            ).alias("target_tokens"),
        )
        .select(
            "lang",
            "n_docs",
            "n_tokens",
            "mix_part",
            "target_tokens",
            epochs.alias("epochs"),
            (epochs > MAX_GOOD_EPOCHS).cast("int").alias("over_repeated"),
        )
    )


def _x14_parts_sql() -> str:
    cases = " ".join(f"WHEN '{k}' THEN {v}" for k, v in MIX_PARTS.items())
    return f"CASE lang {cases} ELSE 0 END"


def _x14_sql() -> str:
    return f"""
WITH per AS (
  SELECT lang, count(*) AS n_docs,
         CAST(sum(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
           AS n_tokens
  FROM documents GROUP BY lang
),
total AS (SELECT sum(n_tokens) AS corpus_tokens FROM per)
SELECT lang, n_docs, n_tokens,
       ({_x14_parts_sql()})::INTEGER AS mix_part,
       target_tokens,
       floor(target_tokens::DOUBLE / n_tokens * 100 + 0.5) / 100.0 AS epochs,
       CASE WHEN floor(target_tokens::DOUBLE / n_tokens * 100 + 0.5) / 100.0
                 > {MAX_GOOD_EPOCHS} THEN 1 ELSE 0 END AS over_repeated
FROM (
  SELECT lang, n_docs, n_tokens,
         CAST(floor(corpus_tokens * {EPOCH_BUDGET_MULT}
                    * ({_x14_parts_sql()}) / {MIX_TOTAL}) AS BIGINT)
           AS target_tokens
  FROM per CROSS JOIN total
)
"""


# --------------------------------------------------------------------------
# x15 — split-distribution drift audit: KL divergence of the val/test
# unigram distributions from train's, over the shared corpus
# vocabulary with add-one smoothing. A deterministic hash split
# SHOULD yield near-zero KL; a large value flags distribution skew
# (topic-correlated ids, leaking time order, a broken split rule) —
# the audit every train/val/test protocol needs before trusting
# validation loss. Splits come from the ONE split rule (split_col —
# x01's), so this audits the real pipeline, not a copy.
#
# Scale: one (split, term) aggregate, three narrow joins on term
# (vocabulary-sized), constant-size totals frame. The per-term KL
# contributions accumulate in DECIMAL (exact, order-independent — the
# s08 discipline) because the corpus-wide sum spans the whole
# vocabulary, then round at the edge.


def x15_split_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rfb_data_pipeline_spark.operators.text import tokens_col

    # r13 note: the t05-class token-stream-memo substitution was
    # prototyped here and REVERTED on a paired same-host measurement —
    # inline 0.83 s min / 12 jobs vs memo 1.09 s / 11 jobs at sf0.1.
    # x15's (split, term) aggregate is consumed four ways but AQE
    # already reuses its one exchange, so the memo only traded a
    # single fused scan+explode for a cached-table rescan and lost.
    docs = _docs(spark, sf_dir).withColumn("split", split_col(F.col("doc_id")))
    terms = docs.select("split", F.explode(tokens_col()).alias("term")).filter(
        F.length("term") > 0
    )
    counts = terms.groupBy("split", "term").agg(F.count(F.lit(1)).alias("c"))

    def side(name: str) -> DataFrame:
        return counts.filter(F.col("split") == name).select(
            "term", F.col("c").alias(f"c_{name}")
        )

    vocab = counts.select("term").distinct()
    wide = (
        vocab.join(side("train"), "term", "left")
        .join(side("val"), "term", "left")
        .join(side("test"), "term", "left")
        .select(
            "term",
            *[
                F.coalesce(F.col(f"c_{s}"), F.lit(0)).alias(f"c_{s}")
                for s in ("train", "val", "test")
            ],
        )
    )
    totals = wide.agg(
        F.sum("c_train").alias("t_train"),
        F.sum("c_val").alias("t_val"),
        F.sum("c_test").alias("t_test"),
        F.count(F.lit(1)).cast("double").alias("v"),
    )

    def kl_term(other: str):
        p = (F.col("c_train") + 1).cast("double") / (F.col("t_train") + F.col("v"))
        q = (F.col(f"c_{other}") + 1).cast("double") / (
            F.col(f"t_{other}") + F.col("v")
        )
        return (p * F.log(p / q)).cast("decimal(28,18)")

    agg = (
        wide.crossJoin(F.broadcast(totals))
        .agg(
            F.sum(kl_term("val")).alias("kv"),
            F.sum(kl_term("test")).alias("kt"),
            F.first("v").alias("v"),
            F.first("t_train").alias("t_train"),
            F.first("t_val").alias("t_val"),
            F.first("t_test").alias("t_test"),
        )
    )
    return agg.select(
        (F.round(F.col("kv").cast("double"), 4) + F.lit(0.0)).alias(
            "kl_train_val"
        ),
        (F.round(F.col("kt").cast("double"), 4) + F.lit(0.0)).alias(
            "kl_train_test"
        ),
        F.col("v").cast("bigint").alias("vocab_size"),
        "t_train",
        "t_val",
        "t_test",
    )


_X15_SQL = f"""
WITH docs AS (
  SELECT *,
         CASE WHEN CAST(floor({_SQL_BUCKET} * 100.0 / 256) AS INTEGER)
                   < {TRAIN_PCT} THEN 'train'
              WHEN CAST(floor({_SQL_BUCKET} * 100.0 / 256) AS INTEGER)
                   < {TRAIN_PCT + VAL_PCT} THEN 'val'
              ELSE 'test' END AS split
  FROM documents
),
terms AS (
  SELECT split, term FROM (
    SELECT split, unnest(string_split_regex(trim(text), '\\s+')) AS term
    FROM docs
  ) WHERE length(term) > 0
),
counts AS (SELECT split, term, count(*) AS c FROM terms GROUP BY 1, 2),
vocab AS (SELECT DISTINCT term FROM counts),
wide AS (
  SELECT v.term,
         coalesce(tr.c, 0) AS c_train,
         coalesce(va.c, 0) AS c_val,
         coalesce(te.c, 0) AS c_test
  FROM vocab v
  LEFT JOIN (SELECT term, c FROM counts WHERE split = 'train') tr USING (term)
  LEFT JOIN (SELECT term, c FROM counts WHERE split = 'val') va USING (term)
  LEFT JOIN (SELECT term, c FROM counts WHERE split = 'test') te USING (term)
),
totals AS (
  SELECT sum(c_train) AS t_train, sum(c_val) AS t_val,
         sum(c_test) AS t_test, count(*)::DOUBLE AS v
  FROM wide
)
SELECT round(sum(((c_train + 1)::DOUBLE / (t_train + v)
                  * ln(((c_train + 1)::DOUBLE / (t_train + v))
                       / ((c_val + 1)::DOUBLE / (t_val + v))))::DECIMAL(28,18)
             )::DOUBLE, 4) + 0.0 AS kl_train_val,
       round(sum(((c_train + 1)::DOUBLE / (t_train + v)
                  * ln(((c_train + 1)::DOUBLE / (t_train + v))
                       / ((c_test + 1)::DOUBLE / (t_test + v))))::DECIMAL(28,18)
             )::DOUBLE, 4) + 0.0 AS kl_train_test,
       CAST(any_value(v) AS BIGINT) AS vocab_size,
       CAST(any_value(t_train) AS BIGINT) AS t_train,
       CAST(any_value(t_val) AS BIGINT) AS t_val,
       CAST(any_value(t_test) AS BIGINT) AS t_test
FROM wide CROSS JOIN totals
"""


# --------------------------------------------------------------------------
# x16 — QUALITY-WEIGHTED domain mixture (the FineWeb-edu move): fill
# each domain's quota with its BEST-scoring documents instead of
# x10's uniform smallest-md5 draw. Composes t15's trained NB quality
# score with x10's exact integer-quota machinery; the per-domain rank
# runs banded two-phase on the SCORE key (band = integer part of the
# ascending sort key -skey — a prefix of the sort order, so per-band
# local ranks + cumulative band offsets reproduce the global
# per-domain rank without a domain-wide single partition; the x09/x10
# shape on a numeric key). Output includes the implied per-domain
# quality FLOOR (min selected score) — the number a mixture designer
# actually argues about.
#
# Determinism: ranks on t15's ROUNDED score (both engines compute the
# identical value — t15 is hash-green) with doc_id tie-break.


def x16_quality_mixture(
    spark: SparkSession,
    sf_dir: str,
    mix_parts: dict[str, int] | None = None,
) -> DataFrame:
    from rfb_data_pipeline_spark.operators.text import t15_scores_cached

    mix_parts = MIX_PARTS if mix_parts is None else mix_parts
    # the materialized-scores column, not a second classifier train
    # (t15_scores_cached docstring; VERDICT r04 item 8)
    scores = t15_scores_cached(spark, sf_dir).select("doc_id", "nb_logodds")
    docs = (
        _docs(spark, sf_dir)
        .select("doc_id", "lang")
        .join(scores, "doc_id")
        .withColumn("skey", -F.col("nb_logodds"))
        .withColumn("band", F.floor("skey"))
        .transform(lambda df: stage_boundary(df, eager=False))
    )
    selected = _banded_quota_select(docs, _mix_quotas(docs, mix_parts))
    return selected.groupBy("lang").agg(
        F.max("n_available").alias("n_available"),
        F.max("quota").cast("bigint").alias("quota"),
        F.count(F.lit(1)).alias("n_selected"),
        (F.round(F.min("nb_logodds"), 3) + F.lit(0.0)).alias(
            "quality_floor"
        ),
        F.sum("doc_id").alias("sel_checksum"),
    )


def _x16_sql() -> str:
    from rfb_data_pipeline_spark.operators.text import _T15_SQL

    return f"""
WITH t15 AS ({_T15_SQL}),
docs AS (
  SELECT d.doc_id, d.lang, t.nb_logodds
  FROM documents d JOIN t15 t ON d.doc_id = t.doc_id
),
counts AS (SELECT lang, count(*) AS n_available FROM docs GROUP BY lang),
total AS (
  SELECT min(CAST(floor(n_available * {MIX_TOTAL}.0
                        / ({_x10_parts_sql()})) AS BIGINT)) AS t_max
  FROM counts
),
quotas AS (
  SELECT lang, n_available,
         CAST(floor(({_x10_parts_sql()}) * t_max / {MIX_TOTAL}.0) AS BIGINT)
           AS quota
  FROM counts CROSS JOIN total
),
ranked AS (
  SELECT doc_id, lang, nb_logodds,
         row_number() OVER (
           PARTITION BY lang ORDER BY -nb_logodds ASC, doc_id ASC
         ) AS rn
  FROM docs
),
selected AS (
  SELECT r.* FROM ranked r JOIN quotas q USING (lang) WHERE r.rn <= q.quota
)
SELECT lang,
       CAST(max(q.n_available) AS BIGINT) AS n_available,
       CAST(max(q.quota) AS BIGINT) AS quota,
       count(*) AS n_selected,
       round(min(s.nb_logodds), 3) + 0.0 AS quality_floor,
       CAST(sum(s.doc_id) AS BIGINT) AS sel_checksum
FROM selected s JOIN quotas q USING (lang)
GROUP BY lang
"""


# --------------------------------------------------------------------------
# x17 — cluster-aware curation: keep the BEST copy of every near-dup
# cluster, not an arbitrary one. Production near-dup dedup doesn't
# drop duplicates blindly — it ranks each cluster's members by the
# quality score and keeps the argmax (FineWeb / RefinedWeb keep-one
# rule). Composes the two materialized corpus columns this engine
# already maintains: the CC labels (dedup.cc_labels_cached — LSH
# pairs + star CC, the d15 path) and the classifier scores
# (text.t15_scores_cached), exactly how the 100 TB pipeline would
# read them (both are persisted columns there, so the registered
# query reads the session memos — the x16 discipline, VERDICT r04
# item 8). Per-cluster argmax is one window over the label key:
# shuffle is keyed on cluster id, frame bounded by cluster size.
# Ties on the (rounded) score break on doc_id ascending — fully
# deterministic on both engines. The oracle recomputes labels from
# the EXACT pair tier (d02 — the d07/d15 oracle rule: same threshold
# ⇒ same clusters at verified-LSH recall) and scores from the t15
# chain, so this row also re-vouches the label/score parity.


def x17_cluster_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rfb_data_pipeline_spark.operators.dedup import cc_labels_cached
    from rfb_data_pipeline_spark.operators.text import t15_scores_cached

    labels = cc_labels_cached(spark, sf_dir)
    scores = t15_scores_cached(spark, sf_dir).select("doc_id", "nb_logodds")
    memb = labels.join(scores, "doc_id")
    w = Window.partitionBy("label").orderBy(
        F.col("nb_logodds").desc(), F.col("doc_id").asc()
    )
    ranked = memb.select(
        "doc_id",
        F.col("label").alias("cluster_id"),
        "nb_logodds",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("label"))
        .alias("n_members"),
    )
    return ranked.filter(F.col("rn") == 1).select(
        "cluster_id",
        F.col("n_members").cast("bigint").alias("n_members"),
        F.col("doc_id").alias("kept_doc"),
        F.col("nb_logodds").alias("kept_logodds"),
        (F.col("n_members") - 1).cast("bigint").alias("n_dropped"),
    )


def _x17_sql() -> str:
    from rfb_data_pipeline_spark.operators.dedup import _D02_SQL
    from rfb_data_pipeline_spark.operators.text import _T15_SQL

    return f"""
WITH RECURSIVE pairs AS (SELECT doc_a, doc_b FROM ({_D02_SQL})),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b, doc_a FROM pairs
),
reach(node, lbl) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
),
comp AS (SELECT node AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY node),
scored AS (SELECT doc_id, nb_logodds FROM ({_T15_SQL})),
memb AS (
  SELECT c.doc_id, c.cluster_id, s.nb_logodds
  FROM comp c JOIN scored s USING (doc_id)
),
ranked AS (
  SELECT doc_id, cluster_id, nb_logodds,
         row_number() OVER (
           PARTITION BY cluster_id ORDER BY nb_logodds DESC, doc_id ASC
         ) AS rn,
         count(*) OVER (PARTITION BY cluster_id) AS n_members
  FROM memb
)
SELECT cluster_id,
       CAST(n_members AS BIGINT) AS n_members,
       doc_id AS kept_doc,
       nb_logodds AS kept_logodds,
       CAST(n_members - 1 AS BIGINT) AS n_dropped
FROM ranked WHERE rn = 1
"""


QUERIES = {
    "x01_split_assign": x01_split_assign,
    "x02_cap_per_group": x02_cap_per_group,
    "x03_stratified_sample": x03_stratified_sample,
    "x04_chunk_documents": x04_chunk_documents,
    "x05_corpus_curation": x05_corpus_curation,
    "x06_shuffle_shard": x06_shuffle_shard,
    "x07_upsert_merge": x07_upsert_merge,
    "x08_split_leakage": x08_split_leakage,
    "x09_pack_sequences": x09_pack_sequences,
    "x10_domain_mixture": x10_domain_mixture,
    "x11_curriculum_buckets": x11_curriculum_buckets,
    "x12_repetition_gate": x12_repetition_gate,
    "x13_weighted_sample": x13_weighted_sample,
    "x14_epoch_plan": x14_epoch_plan,
    "x15_split_drift": x15_split_drift,
    "x16_quality_mixture": x16_quality_mixture,
    "x17_cluster_curation": x17_cluster_curation,
}

ORACLE = {
    "x01_split_assign": _X01_SQL,
    "x02_cap_per_group": _X02_SQL,
    "x03_stratified_sample": _X03_SQL,
    "x04_chunk_documents": _X04_SQL,
    "x05_corpus_curation": _X05_SQL,
    "x06_shuffle_shard": _X06_SQL,
    "x07_upsert_merge": _X07_SQL,
    "x08_split_leakage": _x08_sql(),
    "x09_pack_sequences": _X09_SQL,
    "x10_domain_mixture": _X10_SQL,
    "x11_curriculum_buckets": _X11_SQL.replace("{STOP}", _x11_stop_sql()),
    "x12_repetition_gate": _x12_sql(),
    "x13_weighted_sample": _x13_sql(),
    "x14_epoch_plan": _x14_sql(),
    "x15_split_drift": _X15_SQL,
    "x16_quality_mixture": _x16_sql(),
    "x17_cluster_curation": _x17_sql(),
}
