"""Streaming NB quality scoring: stream == batch (same model, same
scoring function), idempotent batch-id-keyed sink."""

from __future__ import annotations

import glob
import shutil

import pytest

from pyspark.sql import functions as F

from rfb_data_pipeline_spark.streaming import quality_stream as qs
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def model(spark):
    return qs.train_quality_model(spark, SF_SMALL)


def test_stream_scores_match_batch_operator(spark, tmp_path, model):
    """Documents streamed in two drops score identically to the batch
    t15 operator over the same corpus — the model is shared and
    nb_score is the single copy of the inference math."""
    from rfb_data_pipeline_spark.operators.text import t15_quality_classifier

    docs = spark.read.parquet(SF_SMALL + "/documents.parquet")
    half = docs.agg(F.percentile_approx("doc_id", 0.5)).collect()[0][0]
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i, part in enumerate(
        (docs.filter(F.col("doc_id") <= half), docs.filter(F.col("doc_id") > half))
    ):
        stage = tmp_path / f"stage{i}"
        part.coalesce(1).write.parquet(str(stage))
        (src,) = glob.glob(str(stage / "*.parquet"))
        shutil.copy(src, in_dir / f"drop{i}.parquet")

    out = str(tmp_path / "out")
    qs.run_quality_scoring(spark, str(in_dir), out, str(tmp_path / "ckpt"), model)

    streamed = {
        r["doc_id"]: (r["n_tokens"], r["nb_logodds"], r["pred_quality"])
        for r in spark.read.parquet(out).collect()
    }
    batch = {
        r["doc_id"]: (r["n_tokens"], r["nb_logodds"], r["pred_quality"])
        for r in t15_quality_classifier(spark, SF_SMALL).collect()
    }
    assert streamed == batch
    assert len({r["_batch_id"] for r in spark.read.parquet(out).collect()}) == 2


def test_rescoring_a_drop_is_idempotent(spark, tmp_path, model):
    """Re-running the stream over the same backlog with a FRESH
    checkpoint overwrites each (pred_quality, batch_id) partition
    instead of appending — no double-counting."""
    docs = spark.read.parquet(SF_SMALL + "/documents.parquet").limit(40)
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    stage = tmp_path / "stage"
    docs.coalesce(1).write.parquet(str(stage))
    (src,) = glob.glob(str(stage / "*.parquet"))
    shutil.copy(src, in_dir / "drop0.parquet")

    out = str(tmp_path / "out")
    qs.run_quality_scoring(spark, str(in_dir), out, str(tmp_path / "ck1"), model)
    n1 = spark.read.parquet(out).count()
    qs.run_quality_scoring(spark, str(in_dir), out, str(tmp_path / "ck2"), model)
    n2 = spark.read.parquet(out).count()
    assert n1 == n2 == 40
