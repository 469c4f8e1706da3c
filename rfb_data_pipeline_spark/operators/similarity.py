"""Similarity search over the ``embeddings`` table (north star).

- s01: brute-force cosine top-k — the exactness baseline. One pass
  over the table against a broadcast query vector; dot products are
  computed JVM-side with ``zip_with``/``aggregate`` (no Python).
- s02: sign-LSH (axis-aligned random-hyperplane) bucketed ANN — the
  scale path: bucket on the sign pattern of the leading dimensions,
  probe only the query's bucket. Recall < 1 by construction; the
  bucketing is deterministic so the oracle reproduces it exactly.
- s03: all-pairs near-neighbor join above a cosine threshold; at scale
  the same join runs per-bucket instead of all-pairs (s02's bucketing
  composes directly).

Floats: both engines widen float32 → float64 and accumulate
sequentially, which makes dot products bit-identical (verified);
cosine outputs are rounded at the edge anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from rfb_data_pipeline_spark.catalog import load_tables

QUERY_VEC_ID = 0
TOP_K = 10
SIGN_BITS = 6  # leading dims used for the LSH bucket → 2^6 buckets
NEAR_DUP_COS = 0.45


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir, tables=("embeddings",), register_views=False)[
        "embeddings"
    ]


def _dot(a: str, b: str) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: str) -> Column:
    return F.sqrt(_dot(a, a))


def _sign_bucket(col: str) -> Column:
    """Sign pattern of the first SIGN_BITS dims as an integer bucket."""
    bucket = F.lit(0)
    for i in range(SIGN_BITS):
        bucket = bucket + F.when(
            F.element_at(F.col(col), i + 1) >= 0, F.lit(1 << i)
        ).otherwise(0)
    return bucket


_SQL_DOT = (
    "list_sum(list_transform(range(1, 65), "
    "i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE))"
)


def _sql_bucket(col: str) -> str:
    return " + ".join(
        f"(CASE WHEN {col}[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END)"
        for i in range(SIGN_BITS)
    )


# --------------------------------------------------------------------------
# s01 — brute-force cosine top-k against one query vector.


def s01_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    query = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("q")
    )
    cos = _dot("embedding", "q") / (_norm("embedding") * _norm("q"))
    return (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(query))
        .select("vec_id", "label", (F.round(cos, 4) + F.lit(0.0)).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(TOP_K)
    )


_S01_SQL = f"""
WITH q AS (SELECT embedding AS q FROM embeddings WHERE vec_id = {QUERY_VEC_ID})
SELECT vec_id, label,
       round({_SQL_DOT.format(a="embedding", b="q")}
             / (sqrt({_SQL_DOT.format(a="embedding", b="embedding")})
                * sqrt({_SQL_DOT.format(a="q", b="q")})), 4) + 0.0 AS cosine
FROM embeddings, q
WHERE vec_id != {QUERY_VEC_ID}
ORDER BY cosine DESC, vec_id ASC
LIMIT {TOP_K}
"""


# --------------------------------------------------------------------------
# s02 — ANN via sign-LSH bucket probe: only vectors in the query's
# bucket are scored. At 100 TB the table is written bucketed/partitioned
# by this key so the probe is a partition-pruned scan, not a shuffle.


def s02_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir).withColumn("bucket", _sign_bucket("embedding"))
    # multi-probe: the query's bucket plus every bucket at Hamming
    # distance 1 (a vector near a hyperplane lands on either side —
    # probing the flipped-bit buckets recovers those misses at
    # (SIGN_BITS+1)/2^SIGN_BITS of the corpus scanned).
    probe_buckets = F.array(
        F.col("qbucket"),
        *[
            F.col("qbucket").bitwiseXOR(F.lit(1 << i))
            for i in range(SIGN_BITS)
        ],
    )
    query = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("q"), F.col("bucket").alias("qbucket")
    ).select("q", F.explode(probe_buckets).alias("probe"))
    cos = _dot("embedding", "q") / (_norm("embedding") * _norm("q"))
    return (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(query), F.col("bucket") == F.col("probe"))
        .select("vec_id", "label", (F.round(cos, 4) + F.lit(0.0)).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(TOP_K)
    )


_S02_SQL = f"""
WITH e AS (SELECT vec_id, label, embedding,
                  {_sql_bucket("embedding")} AS bucket
           FROM embeddings),
q AS (SELECT embedding AS q, bucket AS qbucket FROM e WHERE vec_id = {QUERY_VEC_ID}),
probes AS (
  SELECT q, unnest([qbucket,
                    {", ".join(f"xor(qbucket, {1 << i})" for i in range(SIGN_BITS))}])
           AS probe
  FROM q
)
SELECT vec_id, label,
       round({_SQL_DOT.format(a="embedding", b="q")}
             / (sqrt({_SQL_DOT.format(a="embedding", b="embedding")})
                * sqrt({_SQL_DOT.format(a="q", b="q")})), 4) + 0.0 AS cosine
FROM e JOIN probes ON bucket = probe
WHERE vec_id != {QUERY_VEC_ID}
ORDER BY cosine DESC, vec_id ASC
LIMIT {TOP_K}
"""


# --------------------------------------------------------------------------
# s03 — near-neighbor pair join above a cosine threshold (embedding
# near-dup detection). All-pairs for verification; compose with s02's
# bucket key for the banded variant at scale.


def s03_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    cos = _dot("ea", "eb") / (_norm("ea") * _norm("eb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", (F.round(cos, 4) + F.lit(0.0)).alias("cosine"))
        .filter(F.col("cosine") >= NEAR_DUP_COS)
    )


# Threshold is applied to the ROUNDED cosine in both engines (a raw
# value like 0.44996 must fall on the same side of the cut everywhere —
# ADVICE round 1).
_S03_SQL = f"""
SELECT * FROM (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         round({_SQL_DOT.format(a="a.embedding", b="b.embedding")}
               / (sqrt({_SQL_DOT.format(a="a.embedding", b="a.embedding")})
                  * sqrt({_SQL_DOT.format(a="b.embedding", b="b.embedding")})), 4) + 0.0
           AS cosine
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
)
WHERE cosine >= {NEAR_DUP_COS}
"""


# --------------------------------------------------------------------------
# s04 — per-label centroids via elementwise array aggregation: explode
# to (label, dim, value), average per (label, dim), re-assemble the
# vector ordered by dim. The one-iteration core of distributed k-means
# (the full loop is driver-controlled re-invocation of this shape).


def s04_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    dims = emb.select(
        "label", F.posexplode("embedding").alias("dim", "v")
    )
    per_dim = dims.groupBy("label", "dim").agg(
        F.avg(F.col("v").cast("double")).alias("avg_v")
    )
    # The centroid ships as a ','-joined fixed-format string, not a raw
    # array: the driver's pandas canonicalizer cannot sort/hash list
    # cells (round-1 q25 crash). %.4f on both engines is bit-stable
    # because the rounded doubles are identical (see module docstring).
    return (
        per_dim.groupBy("label")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            # + 0.0 folds IEEE negative zero to +0.0 (round
                            # can emit -0.0, and engines disagree on it)
                            F.struct(
                                "dim", (F.round("avg_v", 4) + F.lit(0.0)).alias("r")
                            )
                        )
                    ),
                    lambda s: F.format_string("%.4f", s.getField("r")),
                ),
                ",",
            ).alias("centroid"),
            F.count(F.lit(1)).alias("n_dims"),
        )
    )


_S04_SQL = """
WITH dims AS (
  SELECT label, u.i - 1 AS dim, embedding[u.i]::DOUBLE AS v
  FROM embeddings, unnest(range(1, 65)) AS u(i)
), per_dim AS (
  SELECT label, dim, avg(v) AS avg_v FROM dims GROUP BY 1, 2
)
SELECT label,
       list_aggregate(
         list_transform(
           list_sort(list(struct_pack(dim := dim, r := round(avg_v, 4) + 0.0))),
           s -> printf('%.4f', s.r)),
         'string_agg', ',') AS centroid,
       count(*) AS n_dims
FROM per_dim
GROUP BY label
"""


# --------------------------------------------------------------------------
# s05 — IVF (inverted-file) ANN: coarse-quantize the corpus into
# partitions (here the label clusters stand in for k-means cells —
# their centroids come from the s04 shape), score the query against
# the centroids, probe only the top-NPROBE cells, then exact top-k
# within them. At 100 TB the table is partitioned by cell id, so the
# probe is a partition-pruned scan of nprobe/ncells of the data.

NPROBE = 2


def s05_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    dims = emb.select("vec_id", "label", F.posexplode("embedding").alias("dim", "v"))
    cdim = dims.groupBy("label", "dim").agg(
        F.avg(F.col("v").cast("double")).alias("cv")
    )
    qdim = dims.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        "dim", F.col("v").cast("double").alias("qv")
    )
    # cosine(query, centroid) via the exploded-dim join — no array
    # rebuild, one narrow shuffle on dim.
    scores = (
        cdim.join(F.broadcast(qdim), "dim")
        .groupBy("label")
        .agg(
            (
                F.sum(F.col("cv") * F.col("qv"))
                / (
                    F.sqrt(F.sum(F.col("cv") * F.col("cv")))
                    * F.sqrt(F.sum(F.col("qv") * F.col("qv")))
                )
            ).alias("centroid_cos")
        )
    )
    probe = scores.orderBy(F.desc("centroid_cos"), F.asc("label")).limit(NPROBE)
    query = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("q")
    )
    cos = _dot("embedding", "q") / (_norm("embedding") * _norm("q"))
    return (
        emb.join(F.broadcast(probe.select("label")), "label")
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(query))
        .select("vec_id", "label", (F.round(cos, 4) + F.lit(0.0)).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(TOP_K)
    )


_S05_SQL = f"""
WITH dims AS (
  SELECT vec_id, label, u.i - 1 AS dim, embedding[u.i]::DOUBLE AS v
  FROM embeddings, unnest(range(1, 65)) AS u(i)
), cdim AS (
  SELECT label, dim, avg(v) AS cv FROM dims GROUP BY 1, 2
), qdim AS (
  SELECT dim, v AS qv FROM dims WHERE vec_id = {QUERY_VEC_ID}
), scores AS (
  SELECT label,
         sum(cv * qv) / (sqrt(sum(cv * cv)) * sqrt(sum(qv * qv))) AS centroid_cos
  FROM cdim JOIN qdim USING (dim)
  GROUP BY label
), probe AS (
  SELECT label FROM scores ORDER BY centroid_cos DESC, label ASC LIMIT {NPROBE}
),
q AS (SELECT embedding AS q FROM embeddings WHERE vec_id = {QUERY_VEC_ID})
SELECT vec_id, label,
       round({_SQL_DOT.format(a="embedding", b="q")}
             / (sqrt({_SQL_DOT.format(a="embedding", b="embedding")})
                * sqrt({_SQL_DOT.format(a="q", b="q")})), 4) + 0.0 AS cosine
FROM embeddings JOIN probe USING (label), q
WHERE vec_id != {QUERY_VEC_ID}
ORDER BY cosine DESC, vec_id ASC
LIMIT {TOP_K}
"""


QUERIES = {
    "s01_knn_bruteforce": s01_knn_bruteforce,
    "s02_ann_lsh": s02_ann_lsh,
    "s03_near_dup_pairs": s03_near_dup_pairs,
    "s04_label_centroids": s04_label_centroids,
    "s05_ann_ivf": s05_ann_ivf,
}

ORACLE = {
    "s01_knn_bruteforce": _S01_SQL,
    "s02_ann_lsh": _S02_SQL,
    "s03_near_dup_pairs": _S03_SQL,
    "s04_label_centroids": _S04_SQL,
    "s05_ann_ivf": _S05_SQL,
}
