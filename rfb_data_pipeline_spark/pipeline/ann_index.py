"""Materialized ANN index layouts: the at-scale storage half of the
similarity operators' claims, made real and plan-verified.

- s02's docstring: "at 100 TB the bucketed index (vec_id, t, bucket)
  is a materialized table partitioned by (t, bucket), so each probe
  is a partition-pruned read of ~NUM_TABLES/2^SIGN_BITS of the
  corpus" — ``write_lsh_index`` / ``probe_lsh_index`` below ARE that
  layout; the probe's scan carries PartitionFilters (asserted in
  tests/test_ann_index.py), so a query touches only its bucket
  directories, never the corpus.
- s05's docstring: "the table is partitioned by cell id, so the probe
  is a partition-pruned scan of nprobe/ncells of the data" —
  ``write_ivf_index`` stores the cell-partitioned vectors plus a
  KB-sized centroid sidecar; ``probe_ivf_index`` scores the sidecar,
  picks nprobe cells (a control-plane decision over ncells rows), and
  exact-scores only those partitions.

Both probes reproduce the corresponding operator's output exactly
(s02/s05 row parity pinned), so the index is a drop-in physical
layout, not a different algorithm.
"""

from __future__ import annotations

from functools import reduce

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rfb_data_pipeline_spark.plans.stage import stage_boundary
from rfb_data_pipeline_spark.operators.similarity import (
    DIM,
    K_PQ,
    NPROBE,
    NUM_TABLES,
    PQ_M,
    SIGN_BITS,
    TOP_K,
    _bucketed,
    _dot,
    _emb,
    _hyperplanes,
    _norm,
    _pq_d2,
    _pq_model,
)


def write_lsh_index(
    spark: SparkSession,
    sf_dir: str,
    path: str,
    num_tables: int | None = None,
    sign_bits: int | None = None,
) -> None:
    """Materialize the multi-table sign-LSH index partitioned by
    (t, bucket). Each vector appears once per table; the stored norm
    saves two dot products per candidate at probe time (the s03
    layout note).

    Knobs the caller doesn't pin derive from the corpus size
    (lsh_operating_point — the s06 sizing ladder, r11; a PARTIAL pin
    fills the unset knob from the same ladder, mirroring s06), and
    EITHER WAY the resolved point is persisted in a ``_meta``
    sidecar: an index is an artifact, and a probe that must remember
    the writer's (num_tables, sign_bits) out of band is one forgotten
    copy-paste from silently reading the wrong buckets (zero recall,
    no error). ``probe_lsh_index`` reads the sidecar by default.

    Write ORDER is sidecar-first (ADVICE r11): the old data-then-meta
    order left a crash window where an N-derived index existed with
    no sidecar, and the probe silently fell back to the anchor
    constants — wrong bucket partitions, near-zero recall, no error.
    Sidecar-first inverts the failure: a crash between the two leaves
    a marker with NO data files, which every read fails on loudly.
    The clear goes through the Hadoop FS API (not shutil), so file:/,
    hdfs:// and object-store paths all clear for real — a clear that
    silently no-ops would leave the OLD layout's partitions mixed
    under the NEW sidecar (r12 review), which is why a failed delete
    raises instead of proceeding."""
    from rfb_data_pipeline_spark.operators.similarity import (
        _fill_operating_point,
    )

    emb = _emb(spark, sf_dir)
    num_tables, sign_bits = _fill_operating_point(
        spark, sf_dir, num_tables, sign_bits
    )
    idx = _bucketed(emb, num_tables, sign_bits).select(
        "vec_id",
        "label",
        "embedding",
        _norm("embedding").alias("norm"),
        "t",
        "bucket",
    )
    _hadoop_rmtree(spark, path)
    _write_index_meta(
        spark, path, num_tables=num_tables, sign_bits=sign_bits
    )
    # append: the dir was just cleared and now holds only _meta; an
    # overwrite here would delete the sidecar written above
    idx.write.mode("append").partitionBy("t", "bucket").parquet(path)


def _hadoop_rmtree(spark: SparkSession, path: str) -> None:
    """Recursive delete through the Hadoop FS API: resolves whatever
    filesystem the path names (local, file:/, hdfs://, s3a://), so a
    pre-write clear works everywhere Spark can write. Raises when the
    FS reports a failed delete on an existing path — proceeding would
    append a new layout into the old one under a fresh sidecar."""
    jvm = spark._sc._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(p) and not fs.delete(p, True):
        raise RuntimeError(f"could not clear existing index at {path!r}")


def _write_index_meta(spark: SparkSession, path: str, **fields: int) -> None:
    """Persist an index's layout parameters as a ``_meta`` sidecar
    (underscore dir: invisible to the index's parquet discovery;
    written through Spark so it works on any Hadoop-compatible FS)."""
    (
        spark.createDataFrame(
            [tuple(int(v) for v in fields.values())],
            ", ".join(f"{k} int" for k in fields),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .json(f"{path}/_meta")
    )


def _read_index_meta(spark: SparkSession, path: str) -> dict | None:
    """The sidecar's fields, or None for a pre-r11 index (no sidecar)
    or an unreadable one — callers either fall back to the module
    constants (LSH: any point is valid, the sidecar just has to agree
    with the writer) or degrade to assuming the current constants
    (minhash/span: the pre-meta back-compat path, the
    ``_prune_doc_shards`` discipline)."""
    from pyspark.errors import AnalysisException

    try:
        row = spark.read.json(f"{path}/_meta").first()
    except AnalysisException:
        return None
    return None if row is None else row.asDict()


def read_lsh_meta(spark: SparkSession, path: str) -> tuple[int, int] | None:
    d = _read_index_meta(spark, path)
    if d is None:
        return None
    nt, sb = d.get("num_tables"), d.get("sign_bits")
    if nt is None or sb is None:
        return None
    return int(nt), int(sb)


def _assert_layout_constants(
    meta: dict | None, expected: dict, path: str, kind: str
) -> None:
    """Fail LOUD when a probe's layout constants disagree with the
    constants the index was WRITTEN with. These values (signature
    length, banding, shard counts, span width) are baked into the
    on-disk content: a silent mismatch doesn't error — it hashes into
    different buckets/shards and returns zero or wrong pairs with
    every job green, which for a dedup index means duplicate data
    flows downstream unflagged. A pre-meta index (None) degrades to
    assuming the current constants, documented back-compat."""
    if meta is None:
        return
    bad = {
        k: (int(meta[k]), v)
        for k, v in expected.items()
        if meta.get(k) is not None and int(meta[k]) != v
    }
    if bad:
        detail = ", ".join(
            f"{k}: index={got} code={want}" for k, (got, want) in bad.items()
        )
        raise RuntimeError(
            f"{kind} index at {path!r} was written with different layout "
            f"constants than this code probes with ({detail}): the probe "
            "would silently miss matches. Rebuild the index with the "
            "current code, or probe with the writer's."
        )


def query_buckets(
    qvec: list[float], num_tables: int = NUM_TABLES, sign_bits: int = SIGN_BITS
) -> list[tuple[int, int]]:
    """The query vector's (t, bucket) per table — the same sequential
    float64 fold as the engines', evaluated driver-side (a constant-
    size computation) so the probe filter is a LITERAL partition
    predicate Catalyst prunes at planning time."""
    hp = _hyperplanes(num_tables, sign_bits)
    w = np.array(hp, dtype=np.float64).reshape(num_tables * sign_bits, DIM)
    q = np.asarray(qvec, dtype=np.float64)
    acc = np.zeros(w.shape[0], dtype=np.float64)
    for i in range(DIM):  # sequential over dims == engines' fold
        acc += q[i] * w[:, i]
    bits = (acc >= 0).reshape(num_tables, sign_bits)
    powers = (1 << np.arange(sign_bits)).astype(np.int64)
    return [(t, int((bits[t] * powers).sum())) for t in range(num_tables)]


def probe_lsh_index(
    spark: SparkSession,
    path: str,
    qvec: list[float],
    exclude_vec_id: int | None = None,
    top_k: int = TOP_K,
    num_tables: int | None = None,
    sign_bits: int | None = None,
) -> DataFrame:
    """Partition-pruned probe: read ONLY the query's bucket
    directories, dedup candidates, exact-score against the broadcast
    literal query vector. Output schema/ordering matches s02.

    The operating point defaults to the index's own ``_meta`` sidecar
    (whatever the writer used — fixed or N-derived); the sidecar is
    consulted whenever EITHER knob is unset, filling only the missing
    one (a partial pin used to bypass it entirely and silently revert
    the other knob to the anchor constant — ADVICE r11). A pre-r11
    index without a sidecar falls back to the module constants."""
    if num_tables is None or sign_bits is None:
        meta = read_lsh_meta(spark, path)
        if meta is not None:
            if num_tables is None:
                num_tables = meta[0]
            if sign_bits is None:
                sign_bits = meta[1]
    num_tables = NUM_TABLES if num_tables is None else num_tables
    sign_bits = SIGN_BITS if sign_bits is None else sign_bits
    # Require the parquet job-commit marker before trusting the index
    # (ADVICE r12): sidecar-first writing closes the marker-but-no-data
    # window loudly, but a driver crash DURING the append's commit (or
    # committer algorithm v2) can leave a valid _meta over partially
    # published bucket partitions — which reads cleanly with silently
    # reduced recall. _SUCCESS exists iff the append job committed.
    jvm = spark._sc._jvm
    marker = jvm.org.apache.hadoop.fs.Path(f"{path}/_SUCCESS")
    fs = marker.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(marker):
        raise RuntimeError(
            f"LSH index at {path!r} has no _SUCCESS job-commit marker: "
            "the index write did not complete (or the FS layout was "
            "tampered with); probing it would return silently reduced "
            "recall. Rebuild with write_lsh_index."
        )
    pairs = query_buckets(qvec, num_tables, sign_bits)
    cond = reduce(
        lambda a, b: a | b,
        [
            (F.col("t") == F.lit(t)) & (F.col("bucket") == F.lit(b))
            for t, b in pairs
        ],
    )
    idx = spark.read.parquet(path).where(cond)
    if exclude_vec_id is not None:
        idx = idx.filter(F.col("vec_id") != exclude_vec_id)
    cand = idx.groupBy("vec_id").agg(
        F.first("label").alias("label"),
        F.first("embedding").alias("embedding"),
        F.first("norm").alias("norm"),
    )
    q = F.array(*[F.lit(float(x)) for x in qvec])
    # sequential fold (not np.dot's pairwise sum) so the query norm is
    # bit-identical to the engines' aggregate fold
    acc = 0.0
    for x in qvec:
        acc += float(x) * float(x)
    qn = float(np.sqrt(acc))
    cos = _dot("embedding", "qarr") / (F.col("norm") * F.lit(qn))
    return (
        cand.withColumn("qarr", q)
        .select(
            "vec_id", "label", (F.round(cos, 4) + F.lit(0.0)).alias("cosine")
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(top_k)
    )


def write_ivf_index(spark: SparkSession, sf_dir: str, path: str) -> None:
    """Cell-partitioned IVF layout (s05's cells = the label clusters)
    plus the KB-sized centroid sidecar the probe scores first. The
    sidecar uses the ONE copy of the centroid math
    (similarity.centroid_arrays — decimal-exact, order-independent
    sums), same as the streaming ingest path."""
    from rfb_data_pipeline_spark.operators.similarity import centroid_arrays

    emb = _emb(spark, sf_dir)
    emb.select("vec_id", "embedding", "label").write.mode(
        "overwrite"
    ).partitionBy("label").parquet(f"{path}/cells")
    cents = centroid_arrays(emb).select(
        "label", F.col("c_arr").alias("centroid")
    )
    cents.coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")


def _sidecar_probe_cells(
    spark: SparkSession, path: str, qvec: list[float], nprobe: int
) -> list[int]:
    """Top-nprobe cell ids from the KB centroid sidecar — a
    control-plane decision over ncells rows (shared by the IVF and
    IVF-PQ probes)."""
    q = np.asarray(qvec, dtype=np.float64)
    cents = spark.read.parquet(f"{path}/centroids").collect()
    scored = []
    for r in cents:
        c = np.asarray(r["centroid"], dtype=np.float64)
        # sequential fold, same operation order as the engines
        dot = cn = qn = 0.0
        for i in range(DIM):
            dot += c[i] * q[i]
            cn += c[i] * c[i]
            qn += q[i] * q[i]
        scored.append((dot / (np.sqrt(cn) * np.sqrt(qn)), r["label"]))
    scored.sort(key=lambda x: (-x[0], x[1]))
    return [label for _, label in scored[:nprobe]]


def probe_ivf_index(
    spark: SparkSession,
    path: str,
    qvec: list[float],
    exclude_vec_id: int | None = None,
    nprobe: int = NPROBE,
    top_k: int = TOP_K,
) -> DataFrame:
    """Score the centroid sidecar, pick nprobe cells (control-plane —
    ncells rows), then exact-score ONLY those partitions. Output
    matches s05."""
    cells = _sidecar_probe_cells(spark, path, qvec, nprobe)
    idx = spark.read.parquet(f"{path}/cells").where(F.col("label").isin(cells))
    if exclude_vec_id is not None:
        idx = idx.filter(F.col("vec_id") != exclude_vec_id)
    qarr = F.array(*[F.lit(float(x)) for x in qvec])
    cos = _dot("embedding", "qarr") / (_norm("embedding") * _norm("qarr"))
    return (
        idx.withColumn("qarr", qarr)
        .select(
            "vec_id", "label", (F.round(cos, 4) + F.lit(0.0)).alias("cosine")
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(top_k)
    )


def write_ivfpq_index(spark: SparkSession, sf_dir: str, path: str) -> None:
    """Materialize the full IVF-PQ layout (s15's amortized build):
    cell-partitioned CODE table (PQ_M small codes per vector — the
    scan payload), the (PQ_M × K_PQ) codebook sidecar, and the
    centroid sidecar for the coarse probe. Training/encoding (the
    dominant cost in s15's query-time measurement) happens ONCE here;
    probes read codes only."""
    from rfb_data_pipeline_spark.operators.similarity import centroid_arrays

    emb = _emb(spark, sf_dir).select("vec_id", "label", "embedding")
    _, codebook, codes = _pq_model(emb, PQ_M, K_PQ)
    (
        codes.join(emb.select("vec_id", "label"), "vec_id")
        .write.mode("overwrite")
        .partitionBy("label")
        .parquet(f"{path}/codes")
    )
    codebook.coalesce(1).write.mode("overwrite").parquet(f"{path}/codebook")
    centroid_arrays(emb).select(
        "label", F.col("c_arr").alias("centroid")
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")


def probe_ivfpq_index(
    spark: SparkSession,
    path: str,
    qvec: list[float],
    exclude_vec_id: int | None = None,
    nprobe: int = NPROBE,
    top_k: int = TOP_K,
) -> DataFrame:
    """IVF-PQ probe over the materialized layout: pick nprobe cells
    from the centroid sidecar, build the broadcast ADC table from the
    codebook sidecar (same sequential fold as s15), then scan ONLY the
    probed cells' code partitions. Output matches s15."""
    cells = _sidecar_probe_cells(spark, path, qvec, nprobe)
    codebook = spark.read.parquet(f"{path}/codebook")
    sub_dim = DIM // PQ_M
    qsubs = F.array(
        *[
            F.array(
                *[
                    F.lit(float(x))
                    for x in qvec[m * sub_dim : (m + 1) * sub_dim]
                ]
            )
            for m in range(PQ_M)
        ]
    )
    qv = F.element_at(qsubs, F.col("m") + 1)
    # the ONE copy of the ADC distance fold (similarity._pq_d2 —
    # zip_with accepts Column operands)
    adc = codebook.select(
        F.col("m").alias("am"),
        F.col("cid").alias("acid"),
        _pq_d2(qv, F.col("c")).alias("adc_d2"),
    )
    codes = spark.read.parquet(f"{path}/codes").where(F.col("label").isin(cells))
    if exclude_vec_id is not None:
        codes = codes.filter(F.col("vec_id") != exclude_vec_id)
    scored = (
        codes.join(
            F.broadcast(adc),
            (F.col("m") == F.col("am")) & (F.col("code") == F.col("acid")),
        )
        .groupBy("vec_id")
        .agg(
            F.first("label").alias("label"),
            F.sum(F.col("adc_d2").cast("decimal(30,15)")).alias("ad2"),
        )
    )
    return (
        scored.orderBy(F.asc("ad2"), F.asc("vec_id"))
        .limit(top_k)
        .select(
            "vec_id",
            "label",
            (F.round(F.col("ad2").cast("double"), 4) + F.lit(0.0)).alias(
                "approx_d2"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Materialized MinHash-LSH signature index — the corpus side of d16's
# incremental near-dup dedup, realized as a storage layout (ADVICE r04:
# the operator's at-scale claim must be executable, not aspirational).
#
# Layout under ``path``:
#   buckets/   (doc_id, bucket) partitioned by (band_idx, shard) where
#              shard = pmod(xxhash64(bucket), MINHASH_INDEX_SHARDS).
#              Bucket values are md5 hex (cardinality ~ docs x bands),
#              so the DIRECTORY key is the shard, and the probe prunes
#              to the batch's (band_idx, shard) set — a small fraction
#              when the incremental batch is small relative to the
#              corpus, which is the incremental-dedup regime.
#   shingles/  (doc_id, shingle) — the corpus shingle store every
#              near-dup pipeline already materializes, partitioned by
#              dshard = pmod(xxhash64(doc_id), shards) (r08): the
#              probe's exact-verification join collects the CANDIDATE
#              doc shards (control-plane, bounded by the shard count)
#              and prunes the store scan to them — without this the
#              verification step was a FULL shingle-store scan, the
#              one linear-in-corpus read left in the probe.
#   sizes/     (doc_id, sz) — per-doc distinct-shingle counts for the
#              Jaccard denominator (KB-scale per million docs), same
#              dshard layout.
#
# The probe reproduces d16's candidate generation + verification
# exactly (same _minhash_buckets banding, same JACCARD_THRESHOLD), so
# the index is a drop-in physical layout — pinned by
# tests/test_ann_index.py::test_minhash_probe_matches_d16.

MINHASH_INDEX_SHARDS = 32


def _minhash_shard(bucket_col) -> F.Column:
    return F.pmod(F.xxhash64(bucket_col), F.lit(MINHASH_INDEX_SHARDS)).cast(
        "int"
    )


def _doc_shard(doc_id_col) -> F.Column:
    return F.pmod(F.xxhash64(doc_id_col), F.lit(MINHASH_INDEX_SHARDS)).cast(
        "int"
    )


def write_minhash_index(
    spark: SparkSession, corpus_docs: DataFrame, path: str
) -> None:
    """Materialize the (band_idx, shard)-partitioned signature index
    plus the shingle/size stores for ``corpus_docs`` (doc_id, text)."""
    from rfb_data_pipeline_spark.operators.dedup import (
        _doc_shingles,
        _minhash_buckets,
    )

    sh = _doc_shingles(corpus_docs).transform(stage_boundary)
    buckets = _minhash_buckets(sh).select(
        "doc_id", "bucket", "band_idx", _minhash_shard(F.col("bucket")).alias("shard")
    )
    buckets.write.mode("overwrite").partitionBy("band_idx", "shard").parquet(
        f"{path}/buckets"
    )
    sh.withColumn("dshard", _doc_shard(F.col("doc_id"))).write.mode(
        "overwrite"
    ).partitionBy("dshard").parquet(f"{path}/shingles")
    sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz")).withColumn(
        "dshard", _doc_shard(F.col("doc_id"))
    ).write.mode("overwrite").partitionBy("dshard").parquet(f"{path}/sizes")
    # layout constants are baked into the stored bucket/shard VALUES:
    # persist them so a probe under drifted constants fails loud
    # instead of silently missing every match (r11 review)
    from rfb_data_pipeline_spark.operators.dedup import (
        MINHASH_BAND_ROWS,
        MINHASH_K,
    )

    _write_index_meta(
        spark,
        path,
        minhash_k=MINHASH_K,
        band_rows=MINHASH_BAND_ROWS,
        shards=MINHASH_INDEX_SHARDS,
    )


def _prune_doc_shards(store: DataFrame, cand_shards: list[int]) -> DataFrame:
    """Prune a shingle/size store scan to the candidates' doc shards
    when the store carries the r08 ``dshard`` partition column; a
    pre-r08 index (written before the dshard layout existed) DEGRADES
    to the original full-store scan instead of failing with an
    unresolved-column error (ADVICE r08 #5 — on-disk format
    compatibility: an index is a persisted artifact, so a probe-side
    code upgrade must not break reads of existing indexes)."""
    if "dshard" in store.columns:
        return store.where(F.col("dshard").isin(cand_shards))
    return store


def _minhash_candidates(
    spark: SparkSession, path: str, b_buckets: DataFrame
) -> DataFrame | None:
    """LAZY candidate pairs (doc_batch, doc_corpus) from the pruned
    bucket scan — factored out so tests can assert the (band_idx,
    shard) PartitionFilters on this stage's own plan (the probe
    checkpoints it, which hides the scan from the final plan). None
    when the batch produced no buckets."""
    touched = [
        (r["band_idx"], r["shard"])
        for r in b_buckets.select("band_idx", "shard").distinct().collect()
    ]
    if not touched:
        return None
    cond = reduce(
        lambda a, b: a | b,
        [
            (F.col("band_idx") == F.lit(bi)) & (F.col("shard") == F.lit(s))
            for bi, s in touched
        ],
    )
    idx = spark.read.parquet(f"{path}/buckets").where(cond)
    return (
        b_buckets.join(idx, ["band_idx", "bucket"])
        .select("doc_batch", F.col("doc_id").alias("doc_corpus"))
        .distinct()
    )


def probe_minhash_index(
    spark: SparkSession, path: str, batch_docs: DataFrame
) -> DataFrame:
    """Near-dup pairs (doc_batch, doc_corpus, jaccard >= threshold)
    for a new crawl batch against the materialized corpus index.

    The batch's (band_idx, shard) set is collected driver-side (a
    control-plane frame bounded by n_bands x MINHASH_INDEX_SHARDS =
    128 rows) and becomes a LITERAL partition predicate, so the
    bucket scan touches only the batch's shard directories. Candidate
    equi-join on (band_idx, bucket); exact-Jaccard verification joins
    the corpus shingle store on candidate doc_ids only.
    """
    from rfb_data_pipeline_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        MINHASH_BAND_ROWS,
        MINHASH_K,
        _doc_shingles,
        _minhash_buckets,
    )

    _assert_layout_constants(
        _read_index_meta(spark, path),
        {
            "minhash_k": MINHASH_K,
            "band_rows": MINHASH_BAND_ROWS,
            "shards": MINHASH_INDEX_SHARDS,
        },
        path,
        "minhash",
    )
    b_sh = _doc_shingles(batch_docs).transform(stage_boundary)
    b_buckets = _minhash_buckets(b_sh).select(
        F.col("doc_id").alias("doc_batch"),
        "band_idx",
        "bucket",
        _minhash_shard(F.col("bucket")).alias("shard"),
    ).transform(stage_boundary)
    cand_lazy = _minhash_candidates(spark, path, b_buckets)
    if cand_lazy is None:
        # an empty micro-batch (or one of all-short documents with no
        # shingles) produces no LSH buckets — and therefore no pairs;
        # streaming run_incremental_dedup does not control batch
        # content, so this is a reachable case, not an error
        return spark.createDataFrame(
            [], "doc_batch bigint, doc_corpus bigint, jaccard double"
        )
    # the candidate frame is consumed twice (shard collection below +
    # the verification join) — one stage boundary, one evaluation
    cand = cand_lazy.transform(stage_boundary)
    # Candidate doc shards become a second LITERAL partition predicate
    # (control-plane frame bounded by MINHASH_INDEX_SHARDS rows), so
    # the exact-verification join scans only the candidates' shingle /
    # size shards — without this the verification step read the WHOLE
    # corpus shingle store, the one linear-in-corpus read left in the
    # probe (r08, VERDICT r07 item 6).
    cand_shards = [
        int(r["d"])
        for r in cand.select(_doc_shard(F.col("doc_corpus")).alias("d"))
        .distinct()
        .collect()
    ]
    cand_shards.sort()
    c_sh = _prune_doc_shards(
        spark.read.parquet(f"{path}/shingles"), cand_shards
    ).select(F.col("doc_id").alias("doc_corpus"), "shingle")
    common = (
        cand.join(
            b_sh.select(F.col("doc_id").alias("doc_batch"), "shingle"),
            "doc_batch",
        )
        .join(c_sh, ["doc_corpus", "shingle"])
        .groupBy("doc_batch", "doc_corpus")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    b_sz = b_sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz_a")).select(
        F.col("doc_id").alias("doc_batch"), "sz_a"
    )
    c_sz = _prune_doc_shards(
        spark.read.parquet(f"{path}/sizes"), cand_shards
    ).select(F.col("doc_id").alias("doc_corpus"), F.col("sz").alias("sz_b"))
    jac = F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common"))
    return (
        common.join(b_sz, "doc_batch")
        .join(c_sz, "doc_corpus")
        .select(
            "doc_batch",
            "doc_corpus",
            F.round(jac, 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


# --------------------------------------------------------------------------
# Exact-substring span index: the materialized corpus half of d20
# (incremental exact-substring dedup). d17's corpus-wins rule needs
# only MEMBERSHIP of a batch window's hash in the corpus — every
# corpus occurrence precedes the batch — so the index is the
# DISTINCT corpus span-hash set, partitioned by pmod(h, shards) for
# partition-pruned probes. At 100 TB the index is ~one 8-byte hash
# per corpus token (deduplicated), refreshed per crawl by appending
# the accepted batch's unseen hashes.

SPAN_INDEX_SHARDS = 64


def _span_shard(h_col) -> F.Column:
    return F.pmod(h_col, F.lit(SPAN_INDEX_SHARDS)).cast("int")


def write_span_index(
    spark: SparkSession, corpus_docs: DataFrame, path: str
) -> None:
    """Materialize the shard-partitioned distinct span-hash index for
    ``corpus_docs`` (doc_id, text). This IS the periodic fold the
    streaming tier's lineage guard prescribes, so it also CLEARS the
    ``spans_stream`` append tree (and its ``_lineage`` marker): the
    rebuilt base supersedes every stream append by definition —
    leaving them in place would re-raise the lineage error after a
    fold and double-count stale batches (r10 review). Local
    filesystem semantics, like the quarantine cleanup in
    ``pipeline/ingest.py``; route through the Hadoop FS API on an
    object store."""
    import shutil
    from pathlib import Path

    from rfb_data_pipeline_spark.operators.dedup import _doc_spans

    (
        _doc_spans(corpus_docs)
        .select("h")
        .distinct()
        .withColumn("shard", _span_shard(F.col("h")))
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(f"{path}/spans")
    )
    stream_tree = Path(path) / "spans_stream"
    if stream_tree.exists():
        shutil.rmtree(stream_tree, ignore_errors=True)
    from rfb_data_pipeline_spark.operators.dedup import SPAN_TOKENS

    _write_index_meta(
        spark, path, span_tokens=SPAN_TOKENS, shards=SPAN_INDEX_SHARDS
    )


def _stream_spans(spark: SparkSession, path: str):
    """The stream-append subtree (``spans_stream``, partitioned by
    (_src_batch, shard)) or None if no stream has appended yet. Kept
    separate from the batch-written ``spans`` tree so the two never
    mix partition layouts and a replayed batch can overwrite exactly
    its own contribution."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(f"{path}/spans_stream")
    except AnalysisException:
        return None


def probe_span_index(
    spark: SparkSession,
    path: str,
    batch_docs: DataFrame,
    exclude_src_batch: int | None = None,
) -> DataFrame:
    """Per-batch-doc removal budget vs the materialized corpus index:
    reproduces d20's corpus-side marks (plus its batch-internal
    first-copy rule) from the index instead of the corpus text.

    The batch's shard set is collected driver-side (a control-plane
    frame bounded by SPAN_INDEX_SHARDS rows) and becomes a LITERAL
    partition predicate, so the index scan touches only the batch's
    shard directories — the LSH/IVF pruning pattern.

    ``exclude_src_batch``: when probing from a streaming replay, spans
    the SAME batch appended on a previous attempt must not count as
    corpus — pass the current batch id and only stream appends with
    ``_src_batch`` strictly below it are visible (a replayed batch
    sees exactly the index state its first attempt saw)."""
    from pyspark.sql.window import Window

    from rfb_data_pipeline_spark.operators.dedup import (
        SPAN_TOKENS,
        _doc_spans,
        _merge_islands,
    )
    from rfb_data_pipeline_spark.operators.text import tokens_col

    _assert_layout_constants(
        _read_index_meta(spark, path),
        {"span_tokens": SPAN_TOKENS, "shards": SPAN_INDEX_SHARDS},
        path,
        "span",
    )
    b_sp = (
        _doc_spans(batch_docs)
        .withColumn("shard", _span_shard(F.col("h")))
        .transform(stage_boundary)
    )
    touched = sorted(
        r["shard"] for r in b_sp.select("shard").distinct().collect()
    )
    idx = (
        spark.read.parquet(f"{path}/spans")
        .where(F.col("shard").isin([int(s) for s in touched]))
        .select("h")
    )
    appended = _stream_spans(spark, path)
    if appended is not None:
        if exclude_src_batch is not None:
            appended = appended.where(
                F.col("_src_batch") < F.lit(int(exclude_src_batch))
            )
        idx = idx.unionByName(
            appended.where(
                F.col("shard").isin([int(s) for s in touched])
            ).select("h")
        )
    vs_corpus = b_sp.join(idx, "h", "left_semi").select("doc_id", "s")
    first_rank = Window.partitionBy("h").orderBy("doc_id", "s")
    within_batch = (
        b_sp.join(idx, "h", "left_anti")
        .withColumn("rn", F.row_number().over(first_rank))
        .filter(F.col("rn") > 1)
        .select("doc_id", "s")
    )
    removed = vs_corpus.unionByName(within_batch).select(
        "doc_id", "s", (F.col("s") + SPAN_TOKENS - 1).alias("e")
    )
    cov = (
        _merge_islands(removed)
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("e0") - F.col("s0") + 1)
            .cast("bigint")
            .alias("tokens_removed")
        )
    )
    base = batch_docs.filter(F.col("text").isNotNull()).select(
        "doc_id", F.size(tokens_col()).cast("bigint").alias("n_tokens")
    )
    return base.join(cov, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce("tokens_removed", F.lit(0))
        .cast("bigint")
        .alias("tokens_removed"),
    )
