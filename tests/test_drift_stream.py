"""Streaming drift monitor: stream == batch KL, and the flag actually
fires on a distribution shift."""

from __future__ import annotations

import glob
import shutil

import pytest

from pyspark.sql import functions as F

from rfb_data_pipeline_spark.streaming import drift_stream as ds
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def reference(spark):
    return ds.train_reference(spark, SF_SMALL)


def _drop(df, tmp_path, name):
    in_dir = tmp_path / "in"
    in_dir.mkdir(exist_ok=True)
    stage = tmp_path / f"stage_{name}"
    df.coalesce(1).write.parquet(str(stage))
    (src,) = glob.glob(str(stage / "*.parquet"))
    shutil.copy(src, in_dir / f"{name}.parquet")
    return str(in_dir)


def test_stream_kl_matches_batch_and_flags_drift(spark, tmp_path, reference):
    """Drop 1: a same-distribution sample (docs from the reference
    corpus itself) → low KL, no flag. Drop 2: vocabulary-shifted spam
    → high KL, flagged. Each streamed row must equal the shared
    function applied to the same static frame."""
    normal = spark.read.parquet(SF_SMALL + "/documents.parquet").limit(60)
    spam_rows = [
        (10_000 + i, " ".join(f"zz{j}q" for j in range(40)), "en", "spam")
        for i in range(60)
    ]
    spam = spark.createDataFrame(
        spam_rows, "doc_id bigint, text string, lang string, source string"
    )
    in_dir = _drop(normal, tmp_path, "drop0")
    _drop(spam, tmp_path, "drop1")

    out = str(tmp_path / "out")
    ds.run_drift_monitor(spark, in_dir, out, str(tmp_path / "ckpt"), reference)

    rows = {
        r["_batch_id"]: r
        for r in spark.read.parquet(out).collect()
    }
    assert len(rows) == 2
    kls = sorted(
        (r["kl_vs_reference"], r["drift_flag"]) for r in rows.values()
    )
    low, high = kls
    assert low[1] == 0 and low[0] < ds.DRIFT_KL_THRESHOLD
    assert high[1] == 1 and high[0] > ds.DRIFT_KL_THRESHOLD

    # stream == batch: re-score each drop through the SAME function
    for name, df in (("drop0", normal), ("drop1", spam)):
        direct = ds.kl_vs_reference(df, reference).collect()[0]
        match = [
            r
            for r in rows.values()
            if abs(r["kl_vs_reference"] - direct["kl_vs_reference"]) < 1e-9
            and r["batch_tokens"] == direct["batch_tokens"]
        ]
        assert match, name


def test_e18_replay_equals_stream_scoring_of_the_same_split(
    spark, tmp_path
):
    """The registered e18 query (odd half scored against even-half
    reference) must equal the streaming monitor draining the odd half
    as one micro-batch with the same reference — the driver row
    vouches for the STREAM's math."""
    from rfb_data_pipeline_spark.operators.events import e18_drift_replay

    docs = spark.read.parquet(SF_SMALL + "/documents.parquet")
    even = docs.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 0)
    odd = docs.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 1)
    reference = (
        even.select(
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term")
        )
        .filter(F.length("term") > 0)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c_ref"))
        .localCheckpoint(eager=True)
    )
    in_dir = _drop(
        odd.select("doc_id", "text", "lang", "source"), tmp_path, "odd"
    )
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    ds.run_drift_monitor(
        spark, in_dir, out_dir, ckpt, reference, max_files_per_trigger=10
    )
    streamed = (
        spark.read.parquet(out_dir)
        .drop("_batch_id")
        .select("batch_tokens", "union_vocab", "kl_vs_reference", "drift_flag")
        .collect()
    )
    direct = (
        e18_drift_replay(spark, SF_SMALL)
        .select("batch_tokens", "union_vocab", "kl_vs_reference", "drift_flag")
        .collect()
    )
    assert len(streamed) == 1
    assert [tuple(r) for r in streamed] == [tuple(r) for r in direct]
