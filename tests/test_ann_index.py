"""Materialized ANN index layouts: probe parity with the query-time
operators (s02/s05) and the partition-pruning plan claims."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from rfb_data_pipeline_spark.operators.similarity import QUERY_VEC_ID
from rfb_data_pipeline_spark.pipeline.ann_index import (
    probe_ivf_index,
    probe_lsh_index,
    query_buckets,
    write_ivf_index,
    write_lsh_index,
)
from rfb_data_pipeline_spark.plans import inspect as pi
from tests.conftest import SF_SMALL as SF


def _query_vec(spark):
    return (
        spark.read.parquet(SF + "/embeddings.parquet")
        .filter(F.col("vec_id") == QUERY_VEC_ID)
        .collect()[0]["embedding"]
    )


def test_lsh_index_probe_matches_s02(spark, tmp_path):
    from rfb_data_pipeline_spark.operators.similarity import s02_ann_lsh

    path = str(tmp_path / "lsh_idx")
    write_lsh_index(spark, SF, path)
    qvec = _query_vec(spark)
    probe = probe_lsh_index(
        spark, path, qvec, exclude_vec_id=QUERY_VEC_ID
    ).collect()
    direct = s02_ann_lsh(spark, SF).collect()
    assert [tuple(r) for r in probe] == [tuple(r) for r in direct]


def test_lsh_probe_scan_is_partition_pruned(spark, tmp_path):
    path = str(tmp_path / "lsh_idx2")
    write_lsh_index(spark, SF, path)
    qvec = _query_vec(spark)
    probe = probe_lsh_index(spark, path, qvec, exclude_vec_id=QUERY_VEC_ID)
    plan = pi.explain_string(probe, "formatted")
    # the scan must push the (t, bucket) literals into PartitionFilters
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters")[1].split("]")[0]
    assert "t" in seg and "bucket" in seg
    # and the layout on disk is the partitioned directory tree
    assert any(d.startswith("t=") for d in os.listdir(path))


def test_lsh_probe_reads_fraction_of_files(spark, tmp_path):
    """The probe must open only its bucket directories — the measured
    scan fraction, not just the plan string."""
    path = str(tmp_path / "lsh_idx3")
    write_lsh_index(spark, SF, path)
    qvec = _query_vec(spark)
    pairs = set(query_buckets(qvec))
    all_dirs = 0
    probe_dirs = 0
    for t_dir in os.listdir(path):
        if not t_dir.startswith("t="):
            continue
        t = int(t_dir.split("=")[1])
        for b_dir in os.listdir(os.path.join(path, t_dir)):
            if not b_dir.startswith("bucket="):
                continue
            all_dirs += 1
            if (t, int(b_dir.split("=")[1])) in pairs:
                probe_dirs += 1
    assert probe_dirs == len(pairs)
    # 16 tables x 2^6 buckets: the probe touches a small fraction of
    # the populated directories
    assert probe_dirs / all_dirs < 0.25


def test_ivf_index_probe_matches_s05(spark, tmp_path):
    from rfb_data_pipeline_spark.operators.similarity import s05_ann_ivf

    path = str(tmp_path / "ivf_idx")
    write_ivf_index(spark, SF, path)
    qvec = _query_vec(spark)
    probe = probe_ivf_index(
        spark, path, qvec, exclude_vec_id=QUERY_VEC_ID
    ).collect()
    direct = s05_ann_ivf(spark, SF).collect()
    assert [tuple(r) for r in probe] == [tuple(r) for r in direct]


def test_ivf_probe_scan_is_partition_pruned(spark, tmp_path):
    path = str(tmp_path / "ivf_idx2")
    write_ivf_index(spark, SF, path)
    qvec = _query_vec(spark)
    probe = probe_ivf_index(spark, path, qvec, exclude_vec_id=QUERY_VEC_ID)
    plan = pi.explain_string(probe, "formatted")
    assert "PartitionFilters" in plan
    assert "label" in plan.split("PartitionFilters")[1].split("]")[0]


def test_ivfpq_index_probe_matches_s15(spark, tmp_path):
    from rfb_data_pipeline_spark.operators.similarity import s15_ivf_pq_ann
    from rfb_data_pipeline_spark.pipeline.ann_index import (
        probe_ivfpq_index,
        write_ivfpq_index,
    )

    path = str(tmp_path / "ivfpq_idx")
    write_ivfpq_index(spark, SF, path)
    qvec = _query_vec(spark)
    probe = probe_ivfpq_index(
        spark, path, qvec, exclude_vec_id=0
    ).collect()
    direct = s15_ivf_pq_ann(spark, SF).collect()
    assert [tuple(r) for r in probe] == [tuple(r) for r in direct]


def test_ivfpq_code_table_is_small_and_cell_partitioned(spark, tmp_path):
    """The materialized code table must carry only (vec_id, m, code)
    per row under cell directories — the 85x-smaller scan payload the
    s15 commentary promises."""
    from rfb_data_pipeline_spark.pipeline.ann_index import write_ivfpq_index

    path = str(tmp_path / "ivfpq_small")
    write_ivfpq_index(spark, SF, path)
    assert any(
        d.startswith("label=") for d in os.listdir(path + "/codes")
    )
    codes = spark.read.parquet(path + "/codes")
    assert set(codes.columns) == {"vec_id", "m", "code", "label"}
    # PQ_M rows per vector, 3-bit codes
    from rfb_data_pipeline_spark.operators.similarity import K_PQ, PQ_M

    n_vec = spark.read.parquet(SF + "/embeddings.parquet").count()
    assert codes.count() == n_vec * PQ_M
    assert codes.agg({"code": "max"}).collect()[0][0] < K_PQ


def test_minhash_probe_matches_d16(spark, tmp_path):
    """The materialized MinHash index probe must reproduce d16's
    result exactly: same banding, same threshold, same verification —
    d16's source-level aggregate rebuilt from probe pairs equals the
    registered query's output."""
    from rfb_data_pipeline_spark.operators.dedup import (
        d16_incremental_minhash,
    )
    from rfb_data_pipeline_spark.pipeline.ann_index import (
        probe_minhash_index,
        write_minhash_index,
    )

    docs = spark.read.parquet(SF + "/documents.parquet")
    corpus = docs.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 0)
    batch = docs.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 1)
    path = str(tmp_path / "mh_idx")
    write_minhash_index(spark, corpus, path)
    pairs = probe_minhash_index(spark, path, batch)
    dup = pairs.select("doc_batch").distinct().withColumn("hit", F.lit(1))
    rebuilt = (
        batch.select("doc_id", "source")
        .join(dup, batch["doc_id"] == dup["doc_batch"], "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_batch_docs"),
            F.count("hit").alias("n_near_dup"),
            F.round(F.count("hit") / F.count(F.lit(1)), 4).alias("dup_rate"),
            F.min(F.when(F.col("hit") == 1, F.col("doc_id"))).alias(
                "first_dup_doc"
            ),
        )
        .orderBy("source")
        .collect()
    )
    direct = d16_incremental_minhash(spark, SF).orderBy("source").collect()
    assert [tuple(r) for r in rebuilt] == [tuple(r) for r in direct]


def test_minhash_probe_scan_is_partition_pruned(spark, tmp_path):
    """A SMALL incremental batch must prune the bucket scan to its own
    (band_idx, shard) directories — plan predicate AND touched-
    directory fraction, the LSH/IVF assertion pattern."""
    import os as _os

    from rfb_data_pipeline_spark.operators.dedup import (
        _doc_shingles,
        _minhash_buckets,
    )
    from rfb_data_pipeline_spark.pipeline.ann_index import (
        _minhash_candidates,
        _minhash_shard,
        write_minhash_index,
    )

    docs = spark.read.parquet(SF + "/documents.parquet")
    corpus = docs.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 0)
    # a ~5%-of-corpus batch: the incremental-dedup regime
    batch = docs.filter(F.pmod(F.col("doc_id"), F.lit(40)) == 1)
    path = str(tmp_path / "mh_idx2")
    write_minhash_index(spark, corpus, path)
    # the candidate stage (the probe checkpoints it, so its bucket
    # scan is inspectable only on the stage's own lazy plan)
    b_buckets = (
        _minhash_buckets(_doc_shingles(batch))
        .select(
            F.col("doc_id").alias("doc_batch"),
            "band_idx",
            "bucket",
            _minhash_shard(F.col("bucket")).alias("shard"),
        )
    )
    cand = _minhash_candidates(spark, path, b_buckets)
    plan = pi.explain_string(cand, "formatted")
    assert "PartitionFilters" in plan
    segs = [
        s.split("]")[0] for s in plan.split("PartitionFilters")[1:]
    ]
    assert any("band_idx" in s and "shard" in s for s in segs), segs
    # directory census: probed (band_idx, shard) pairs vs all on disk
    touched = {
        (r["band_idx"], r["shard"])
        for r in _minhash_buckets(_doc_shingles(batch))
        .select("band_idx", _minhash_shard(F.col("bucket")).alias("shard"))
        .distinct()
        .collect()
    }
    all_dirs = 0
    for bd in _os.listdir(f"{path}/buckets"):
        if bd.startswith("band_idx="):
            all_dirs += sum(
                1
                for sd in _os.listdir(_os.path.join(f"{path}/buckets", bd))
                if sd.startswith("shard=")
            )
    assert len(touched) < all_dirs, (len(touched), all_dirs)


def test_span_probe_matches_d20(spark, tmp_path):
    """The materialized span-index probe must reproduce d20's removal
    budget exactly: corpus membership marks + the batch-internal
    first-copy rule, island-merged."""
    from rfb_data_pipeline_spark.operators.dedup import (
        d20_incremental_span_dedup,
    )
    from rfb_data_pipeline_spark.pipeline.ann_index import (
        probe_span_index,
        write_span_index,
    )

    docs = spark.read.parquet(SF + "/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    path = str(tmp_path / "span_idx")
    write_span_index(spark, corpus, path)
    probed = {
        r["doc_id"]: (r["n_tokens"], r["tokens_removed"])
        for r in probe_span_index(spark, path, batch).collect()
    }
    direct = {
        r["doc_id"]: (r["n_tokens"], r["tokens_removed"])
        for r in d20_incremental_span_dedup(spark, SF).collect()
    }
    assert probed == direct
    assert sum(v[1] for v in direct.values()) > 0  # non-vacuous


def test_span_probe_scan_is_partition_pruned(spark, tmp_path):
    """A SMALL batch must prune the index scan to its own shard
    directories — plan predicate AND touched-directory fraction."""
    import os as _os

    from rfb_data_pipeline_spark.operators.dedup import _doc_spans
    from rfb_data_pipeline_spark.pipeline.ann_index import (
        _span_shard,
        probe_span_index,
        write_span_index,
    )

    docs = spark.read.parquet(SF + "/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    # a tiny batch: ONE document's worth of spans
    batch = docs.filter(F.col("doc_id") % 2 == 1).orderBy("doc_id").limit(1)
    path = str(tmp_path / "span_idx2")
    write_span_index(spark, corpus, path)
    probe = probe_span_index(spark, path, batch)
    plan = pi.explain_string(probe, "formatted")
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters")[1].split("]")[0]
    assert "shard" in seg
    touched = {
        r["shard"]
        for r in _doc_spans(batch)
        .select(_span_shard(F.col("h")).alias("shard"))
        .distinct()
        .collect()
    }
    all_dirs = sum(
        1
        for sd in _os.listdir(f"{path}/spans")
        if sd.startswith("shard=")
    )
    assert len(touched) < all_dirs, (len(touched), all_dirs)


def test_minhash_probe_handles_empty_and_shingleless_batches(
    spark, tmp_path
):
    """ADVICE r05: an empty micro-batch — or one of all-short
    documents that produce no shingles — reaches probe_minhash_index
    through streaming run_incremental_dedup, where batch content is
    not controlled. It must return an empty pair frame, not crash on
    reduce-of-empty."""
    from rfb_data_pipeline_spark.pipeline.ann_index import (
        probe_minhash_index,
        write_minhash_index,
    )

    docs = spark.read.parquet(SF + "/documents.parquet")
    corpus = docs.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 0)
    path = str(tmp_path / "mh_idx_empty")
    write_minhash_index(spark, corpus, path)
    empty = docs.filter(F.lit(False))
    out = probe_minhash_index(spark, path, empty)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "doc_batch", "doc_corpus", "jaccard",
    ]
    shingleless = spark.createDataFrame(
        [(1, "web", "too short")],
        "doc_id bigint, source string, text string",
    )
    assert probe_minhash_index(spark, path, shingleless).count() == 0


def test_minhash_verification_scan_is_doc_shard_pruned(spark, tmp_path):
    """r08 (VERDICT r07 item 6): the exact-verification join must scan
    only the CANDIDATES' shingle/size shards — before this the probe
    read the whole corpus shingle store, the one linear-in-corpus read
    left. Assert (a) the stores are dshard-partitioned on disk, (b)
    the probe plan carries dshard PartitionFilters on both scans, and
    (c) the probe still reproduces d16 exactly under the pruning."""
    import os as _os

    from rfb_data_pipeline_spark.pipeline.ann_index import (
        probe_minhash_index,
        write_minhash_index,
    )

    docs = spark.read.parquet(SF + "/documents.parquet")
    corpus = docs.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 0)
    batch = docs.filter(F.pmod(F.col("doc_id"), F.lit(40)) == 1)
    path = str(tmp_path / "mh_dshard")
    write_minhash_index(spark, corpus, path)
    for store in ("shingles", "sizes"):
        assert any(
            d.startswith("dshard=")
            for d in _os.listdir(_os.path.join(path, store))
        ), store
    probe = probe_minhash_index(spark, path, batch)
    plan = pi.explain_string(probe, "formatted")
    # both pruned store scans carry the dshard literal predicate
    assert plan.count("dshard") >= 2, plan[:2000]
    segs = [
        seg.split("]")[0]
        for seg in plan.split("PartitionFilters")[1:]
    ]
    assert sum("dshard" in s for s in segs) >= 2, segs
    # pruning must not change results: same pairs as the inline d16
    # candidate+verify over the same corpus/batch split (subset check
    # on the corpus side: every probe pair's jaccard >= threshold and
    # batch/corpus ids come from the right sides)
    rows = probe.collect()
    assert rows, "probe found no pairs — vacuous fixture"
    batch_ids = {r.doc_id for r in batch.select("doc_id").collect()}
    corpus_ids = {r.doc_id for r in corpus.select("doc_id").collect()}
    assert all(r.doc_batch in batch_ids for r in rows)
    assert all(r.doc_corpus in corpus_ids for r in rows)


def test_minhash_probe_reads_pre_r08_index_without_dshard(spark, tmp_path):
    """ADVICE r08 #5: the dshard-pruned verification scan must DEGRADE
    to the full-store scan on an index written before the r08 layout
    (shingles/sizes not partitioned by dshard), not fail with an
    unresolved-column error — a persisted index is an on-disk format.
    Probe results over the legacy layout must equal the current one."""
    from rfb_data_pipeline_spark.pipeline.ann_index import (
        probe_minhash_index,
        write_minhash_index,
    )

    docs = spark.read.parquet(SF + "/documents.parquet")
    corpus = docs.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 0)
    batch = docs.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 1).limit(40)
    path = str(tmp_path / "mh_idx")
    write_minhash_index(spark, corpus, path)
    want = sorted(
        tuple(r) for r in probe_minhash_index(spark, path, batch).collect()
    )
    assert want, "probe found no pairs — vacuous fixture"

    # rewrite shingles/sizes in the PRE-r08 layout: no dshard column,
    # no partitioning (buckets kept as-is — their layout predates r08)
    legacy = str(tmp_path / "mh_idx_legacy")
    spark.read.parquet(f"{path}/buckets").write.partitionBy(
        "band_idx", "shard"
    ).parquet(f"{legacy}/buckets")
    spark.read.parquet(f"{path}/shingles").drop("dshard").write.parquet(
        f"{legacy}/shingles"
    )
    spark.read.parquet(f"{path}/sizes").drop("dshard").write.parquet(
        f"{legacy}/sizes"
    )
    got = sorted(
        tuple(r) for r in probe_minhash_index(spark, legacy, batch).collect()
    )
    assert got == want


def test_lsh_index_meta_sidecar_roundtrip(spark, tmp_path):
    """r11: the index persists its own operating point — a probe must
    never need to remember the writer's (num_tables, sign_bits) out
    of band (the s06 forgotten-copy-paste hazard applied to a
    persisted artifact: mismatched widths read the wrong buckets and
    return plausible-but-wrong neighbors with zero errors)."""
    from rfb_data_pipeline_spark.operators.similarity import ann_lsh
    from rfb_data_pipeline_spark.pipeline.ann_index import read_lsh_meta

    path = str(tmp_path / "lsh_meta")
    # a NON-default operating point the probe cannot guess
    write_lsh_index(spark, SF, path, num_tables=8, sign_bits=4)
    assert read_lsh_meta(spark, path) == (8, 4)
    qvec = _query_vec(spark)
    # no params: the probe reads the sidecar and matches the explicit
    # query-time operator at the SAME point
    probe = probe_lsh_index(
        spark, path, qvec, exclude_vec_id=QUERY_VEC_ID
    ).collect()
    direct = ann_lsh(
        spark, SF, num_tables=8, sign_bits=4
    ).collect()
    assert [tuple(r) for r in probe] == [tuple(r) for r in direct]
    # the sidecar is invisible to the index's parquet discovery
    assert "_meta" in os.listdir(path)


def test_lsh_partial_pin_fills_other_knob_from_sidecar(spark, tmp_path):
    """ADVICE r11: pinning only ONE knob at probe time used to bypass
    the sidecar entirely, silently reverting the other knob to the
    anchor constant — wrong bucket widths, plausible-but-wrong
    neighbors. The sidecar must fill whichever knob is unset."""
    path = str(tmp_path / "lsh_partial")
    write_lsh_index(spark, SF, path, num_tables=8, sign_bits=4)
    qvec = _query_vec(spark)
    full = probe_lsh_index(
        spark, path, qvec, exclude_vec_id=QUERY_VEC_ID
    ).collect()
    # pin num_tables only: sign_bits must come from the sidecar (4,
    # not the anchor 6)
    half = probe_lsh_index(
        spark, path, qvec, exclude_vec_id=QUERY_VEC_ID, num_tables=8
    ).collect()
    assert [tuple(r) for r in half] == [tuple(r) for r in full]
    # and the symmetric pin
    half2 = probe_lsh_index(
        spark, path, qvec, exclude_vec_id=QUERY_VEC_ID, sign_bits=4
    ).collect()
    assert [tuple(r) for r in half2] == [tuple(r) for r in full]


def test_lsh_write_is_sidecar_first_and_clears_stale_layout(
    spark, tmp_path
):
    """ADVICE r11: the old data-then-meta order left a crash window
    where an N-derived index existed with no sidecar and the probe
    silently fell back to the anchor constants. Sidecar-first inverts
    the failure: crash residue (marker, no data) fails LOUDLY on
    read — since r13 even earlier, at the probe's _SUCCESS commit-
    marker gate (ADVICE r12). A rewrite must also clear the previous
    layout's partitions (append-after-clear, not a stale mix)."""
    import pytest

    from rfb_data_pipeline_spark.pipeline.ann_index import read_lsh_meta

    # crash residue: a dir holding only the sidecar
    residue = str(tmp_path / "lsh_residue")
    from rfb_data_pipeline_spark.pipeline.ann_index import _write_index_meta

    _write_index_meta(spark, residue, num_tables=32, sign_bits=9)
    with pytest.raises(RuntimeError, match="_SUCCESS"):
        probe_lsh_index(spark, residue, _query_vec(spark)).collect()

    # rewrite at a different operating point: no stale t= partitions
    path = str(tmp_path / "lsh_rewrite")
    write_lsh_index(spark, SF, path, num_tables=16, sign_bits=6)
    assert any(d.startswith("t=15") for d in os.listdir(path))
    write_lsh_index(spark, SF, path, num_tables=8, sign_bits=4)
    assert read_lsh_meta(spark, path) == (8, 4)
    stale = [d for d in os.listdir(path) if d.startswith("t=") and
             int(d.split("=")[1]) >= 8]
    assert stale == []


def test_fill_operating_point_partial_pin_uses_ladder(spark, monkeypatch):
    """ADVICE r11 (s06 twin of the probe fix): an unset knob derives
    from the sizing ladder at the memoized corpus count, not the
    anchor constant — at N=20k the ladder is (32, 9), so a partial
    pin must compose with it."""
    from rfb_data_pipeline_spark.operators import similarity as sim

    monkeypatch.setattr(sim, "_emb_count", lambda *_: 20000)
    assert sim._fill_operating_point(spark, SF, None, None) == (32, 9)
    assert sim._fill_operating_point(spark, SF, None, 9) == (32, 9)
    assert sim._fill_operating_point(spark, SF, 32, None) == (32, 9)
    # full pins bypass the ladder (and never touch the count)
    monkeypatch.setattr(
        sim, "_emb_count", lambda *_: (_ for _ in ()).throw(AssertionError)
    )
    assert sim._fill_operating_point(spark, SF, 16, 6) == (16, 6)


def test_lsh_probe_reads_pre_r11_index_without_meta(spark, tmp_path):
    """On-disk compatibility (the _prune_doc_shards discipline): a
    pre-r11 index has no _meta sidecar — the probe must fall back to
    the module constants, not fail."""
    import shutil

    from rfb_data_pipeline_spark.operators.similarity import s02_ann_lsh
    from rfb_data_pipeline_spark.pipeline.ann_index import read_lsh_meta

    path = str(tmp_path / "lsh_premeta")
    write_lsh_index(spark, SF, path)  # derives (16, 6) at this SF
    shutil.rmtree(os.path.join(path, "_meta"))
    assert read_lsh_meta(spark, path) is None
    qvec = _query_vec(spark)
    probe = probe_lsh_index(
        spark, path, qvec, exclude_vec_id=QUERY_VEC_ID
    ).collect()
    direct = s02_ann_lsh(spark, SF).collect()
    assert [tuple(r) for r in probe] == [tuple(r) for r in direct]


def test_index_layout_constant_mismatch_fails_loud(spark, tmp_path):
    """r11 review: banding/shard constants are baked into the stored
    bucket and shard VALUES — probing an index written under different
    constants doesn't error, it silently misses every match (for a
    dedup index: duplicates flow downstream unflagged). The persisted
    _meta sidecar must turn that into a loud RuntimeError naming the
    drifted constant; a pre-meta index (no sidecar) degrades to
    assuming the current constants."""
    import shutil

    import pytest

    from rfb_data_pipeline_spark.pipeline.ann_index import (
        _write_index_meta,
        probe_minhash_index,
        probe_span_index,
        write_minhash_index,
        write_span_index,
    )

    docs = spark.read.parquet(SF + "/documents.parquet").select(
        "doc_id", "text", "lang", "source"
    )
    corpus = docs.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 0)
    batch = docs.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 1).limit(8)

    # minhash: drifted signature length
    mh = str(tmp_path / "mh_drift")
    write_minhash_index(spark, corpus, mh)
    assert probe_minhash_index(spark, mh, batch).count() >= 0  # sane
    _write_index_meta(spark, mh, minhash_k=16, band_rows=3, shards=32)
    with pytest.raises(RuntimeError, match="minhash_k: index=16"):
        probe_minhash_index(spark, mh, batch)

    # span: drifted span width
    sp = str(tmp_path / "sp_drift")
    write_span_index(spark, corpus, sp)
    assert probe_span_index(spark, sp, batch).count() >= 0
    _write_index_meta(spark, sp, span_tokens=8, shards=64)
    with pytest.raises(RuntimeError, match="span_tokens: index=8"):
        probe_span_index(spark, sp, batch)

    # pre-meta back-compat: no sidecar -> probe assumes current
    # constants and still answers
    shutil.rmtree(f"{sp}/_meta")
    assert probe_span_index(spark, sp, batch).count() >= 0


def test_lsh_probe_requires_job_commit_marker(spark, tmp_path):
    """ADVICE r12 (fixed r13): sidecar-first writing fails loud on a
    marker-with-no-data crash, but a crash DURING the append's commit
    (or committer v2) can leave a valid _meta over PARTIALLY published
    bucket partitions, which reads cleanly with silently reduced
    recall. probe_lsh_index must refuse an index whose parquet
    _SUCCESS job-commit marker is missing."""
    import pytest

    path = str(tmp_path / "lsh_uncommitted")
    write_lsh_index(spark, SF, path)
    os.remove(os.path.join(path, "_SUCCESS"))
    qvec = _query_vec(spark)
    with pytest.raises(RuntimeError, match="_SUCCESS"):
        probe_lsh_index(spark, path, qvec, exclude_vec_id=QUERY_VEC_ID)
