"""Round-5 additions: e19 quality-scoring batch replay and x17
cluster-aware curation — stream parity and cluster-argmax properties
beyond the DuckDB oracle rows."""

from __future__ import annotations

import glob
import shutil

import pytest

from pyspark.sql import functions as F

from rfb_data_pipeline_spark.operators.dedup import cc_labels_cached
from rfb_data_pipeline_spark.operators.events import e19_quality_replay
from rfb_data_pipeline_spark.operators.sampling import x17_cluster_curation
from rfb_data_pipeline_spark.operators.text import t15_scores_cached
from tests.conftest import SF_SMALL


def test_e19_matches_streamed_scoring(spark, tmp_path):
    """e19's batch replay equals the REAL stream: train the model on
    the even-id reference half, drain the odd half through
    run_quality_scoring in two drops, and the per-source rollup of the
    streamed sink must reproduce e19's rows exactly."""
    from rfb_data_pipeline_spark.operators.text import nb_train
    from rfb_data_pipeline_spark.streaming import quality_stream as qs

    docs = spark.read.parquet(SF_SMALL + "/documents.parquet")
    reference = docs.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 0)
    batch = docs.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 1)
    cls, totals, prior = nb_train(reference)
    model = (
        cls.localCheckpoint(eager=True),
        totals.localCheckpoint(eager=True),
        prior.localCheckpoint(eager=True),
    )

    half = batch.agg(F.percentile_approx("doc_id", 0.5)).collect()[0][0]
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i, part in enumerate(
        (
            batch.filter(F.col("doc_id") <= half),
            batch.filter(F.col("doc_id") > half),
        )
    ):
        stage = tmp_path / f"stage{i}"
        part.coalesce(1).write.parquet(str(stage))
        (src,) = glob.glob(str(stage / "*.parquet"))
        shutil.copy(src, in_dir / f"drop{i}.parquet")

    out = str(tmp_path / "out")
    qs.run_quality_scoring(spark, str(in_dir), out, str(tmp_path / "ckpt"), model)

    streamed = (
        spark.read.parquet(out)
        .join(batch.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("pred_quality").cast("bigint").alias("n_quality"),
            F.round(
                F.sum("pred_quality") / F.count(F.lit(1)), 4
            ).alias("quality_rate"),
            F.sum("n_tokens").cast("bigint").alias("batch_tokens"),
        )
    )
    want = {tuple(r) for r in e19_quality_replay(spark, SF_SMALL).collect()}
    got = {tuple(r) for r in streamed.collect()}
    assert got == want


@pytest.fixture(scope="module")
def x17_rows(spark):
    return x17_cluster_curation(spark, SF_SMALL).collect()


def test_x17_keeps_the_argmax_member_of_every_cluster(spark, x17_rows):
    """Independent python-side model: group the (label, score) table
    and re-derive each cluster's keep decision."""
    labels = {
        r["doc_id"]: r["label"] for r in cc_labels_cached(spark, SF_SMALL).collect()
    }
    scores = {
        r["doc_id"]: r["nb_logodds"]
        for r in t15_scores_cached(spark, SF_SMALL).collect()
    }
    clusters: dict[int, list[int]] = {}
    for doc, lbl in labels.items():
        clusters.setdefault(lbl, []).append(doc)
    assert clusters, "fixture corpus must contain near-dup clusters"
    want = {}
    for lbl, members in clusters.items():
        best = min(members, key=lambda d: (-scores[d], d))
        want[lbl] = (len(members), best, scores[best], len(members) - 1)
    got = {
        r["cluster_id"]: (
            r["n_members"],
            r["kept_doc"],
            r["kept_logodds"],
            r["n_dropped"],
        )
        for r in x17_rows
    }
    assert got == want


def test_x17_clusters_match_d07_membership(spark, x17_rows):
    """x17's clusters (LSH-edge CC) carry the same ids and sizes as
    d07's exact-pair clusters — the d15 equivalence extended to the
    curation composition."""
    from rfb_data_pipeline_spark.operators.dedup import d07_dedup_clusters

    d07 = {
        r["cluster_id"]: r["n_docs"]
        for r in d07_dedup_clusters(spark, SF_SMALL).collect()
    }
    got = {r["cluster_id"]: r["n_members"] for r in x17_rows}
    assert got == d07


def test_x17_every_cluster_is_multidoc(x17_rows):
    assert all(r["n_members"] >= 2 for r in x17_rows)
    assert all(r["n_dropped"] == r["n_members"] - 1 for r in x17_rows)


def test_stage_boundary_storage_mode_across_families(spark, monkeypatch):
    """Round 5 second session routed EVERY operator-level
    localCheckpoint through stage_boundary; storage mode must stay a
    pure materialization detail for one representative of each newly
    routed family (text sketch, LSH bucketing, banded quota select,
    funnel annotation, cluster curation)."""
    from rfb_data_pipeline_spark.operators.events import e17_multistep_funnel
    from rfb_data_pipeline_spark.operators.similarity import s02_ann_lsh
    from rfb_data_pipeline_spark.operators.text import t10_cms_heavy_hitters
    from rfb_data_pipeline_spark.operators.sampling import x16_quality_mixture
    from tests.conftest import SF_SMALL as sf

    fams = {
        "t10": t10_cms_heavy_hitters,
        "s02": s02_ann_lsh,
        "x16": x16_quality_mixture,
        "e17": e17_multistep_funnel,
        "x17": x17_cluster_curation,
    }
    local = {
        name: sorted(tuple(r) for r in fn(spark, sf).collect())
        for name, fn in fams.items()
    }
    monkeypatch.setenv("RFB_STAGE_BOUNDARY_MODE", "storage")
    for name, fn in fams.items():
        stored = sorted(tuple(r) for r in fn(spark, sf).collect())
        assert stored == local[name], name


def test_m07_payload_roundtrip_and_length(spark):
    """Every synthesized ID3v1 trailer is exactly 128 bytes and every
    fixed-offset field parses back to the value it was built from —
    the encode→slice→decode loop is lossless for all four parsed
    fields plus the two unparsed ones (title/comment)."""
    from rfb_data_pipeline_spark.operators.media import _id3_payload

    docs = spark.read.parquet(SF_SMALL + "/documents.parquet").select("doc_id")
    tagged = docs.select("doc_id", _id3_payload().alias("payload"))

    def fld(start, ln):
        return F.decode(F.substring(F.col("payload"), start, ln), "UTF-8")

    chk = tagged.select(
        "doc_id",
        F.length("payload").alias("n_bytes"),
        fld(1, 3).alias("magic"),
        F.rtrim(fld(4, 30)).alias("title"),
        F.rtrim(fld(34, 30)).alias("artist"),
        fld(94, 4).cast("int").alias("year"),
        F.rtrim(fld(98, 30)).alias("comment"),
        (F.ascii(fld(128, 1)) - 48).alias("genre"),
    ).collect()
    assert chk
    for r in chk:
        did = r["doc_id"]
        assert r["n_bytes"] == 128, did
        assert r["magic"] == "TAG"
        assert r["title"] == f"Track {did % 1000}"
        assert r["artist"] == f"Artist {did % 7}"
        assert r["year"] == 1970 + did % 50
        assert r["comment"] == f"clip {did}"
        assert r["genre"] == did % 10


def test_m08_payload_is_valid_wav_header_per_struct(spark):
    """Independent decoder check (the m05 parity idea): the payload
    Spark builds must parse as a canonical 44-byte PCM WAV header
    under python's struct little-endian unpacking, field for field,
    and the query's in-engine parse must agree with struct's."""
    import struct

    from rfb_data_pipeline_spark.operators.media import _wav_payload

    docs = spark.read.parquet(SF_SMALL + "/documents.parquet").select("doc_id")
    rows = docs.select("doc_id", _wav_payload().alias("payload")).collect()
    assert rows
    for r in rows:
        did, p = r["doc_id"], bytes(r["payload"])
        assert len(p) == 44, did
        assert p[0:4] == b"RIFF" and p[8:12] == b"WAVE"
        assert p[12:16] == b"fmt " and p[36:40] == b"data"
        (fmt_size,) = struct.unpack_from("<I", p, 16)
        tag, ch = struct.unpack_from("<HH", p, 20)
        rate, brate = struct.unpack_from("<II", p, 24)
        blk, bits = struct.unpack_from("<HH", p, 32)
        (dsize,) = struct.unpack_from("<I", p, 40)
        (riff_size,) = struct.unpack_from("<I", p, 4)
        assert fmt_size == 16 and tag == 1 and bits == 16
        assert ch == 1 + did % 2
        assert rate == 8000 * (1 + did % 3)
        assert brate == rate * ch * 2 and blk == ch * 2
        assert dsize == (400 + did % 200) * ch * 2
        assert riff_size == 36 + dsize


def test_e20_matches_python_ewma_model(spark, tmp_path):
    """Third implementation for the EWMA math: the oracle gate proves
    Spark==DuckDB; this proves BOTH match an independent dict-based
    EWMA (same weights, same quantization) on a hand-placed stream —
    including an empty-hour gap inside the spine and a count landing
    exactly where truncation matters."""
    import datetime as dt
    import math

    from pyspark.sql import functions as F

    from rfb_data_pipeline_spark.operators.events import (
        _EWMA_SCALE,
        _EWMA_TAIL,
        _ewma_weights,
        e20_ewma_baseline,
    )

    base = dt.datetime(2024, 4, 1, 0, 0, 0)
    # counts per hour offset: gap at hour 2; burst at hour 3
    placed = {0: 3, 1: 1, 3: 7, 30: 2}  # 30 > tail: exercises truncation
    rows = []
    eid = 0
    for off, n in placed.items():
        for _ in range(n):
            eid += 1
            rows.append(
                (eid, base + dt.timedelta(hours=off, minutes=5), 7, "view",
                 1.0, "{}")
            )
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(str(tmp_path / "events.parquet"))

    w = _ewma_weights()
    want = {}
    for h in range(31):
        units = sum(
            math.floor(placed.get(h - k, 0) * w[k] * _EWMA_SCALE)
            for k in range(_EWMA_TAIL)
            if (h - k) in placed
        )
        want[base + dt.timedelta(hours=h)] = (placed.get(h, 0), units)
    got = {
        r["hour"]: (r["n_events"], r["ewma_units"])
        for r in e20_ewma_baseline(spark, str(tmp_path))
        .where(F.col("event_type") == "view")
        .collect()
    }
    assert got == want
    # hour 28 is beyond every earlier placed hour's 24-hour reach and
    # before hour 30 — a zero baseline proves the tail truncates
    assert got[base + dt.timedelta(hours=28)][1] == 0, "truncation broken"
