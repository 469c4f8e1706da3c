"""Streaming IVF cell assignment: stream == batch == numpy model."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from rfb_data_pipeline_spark.streaming import vector_stream as vs
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def centroids(spark):
    return vs.train_centroids(spark, SF_SMALL).localCheckpoint(eager=True)


def test_assign_cells_matches_numpy(spark):
    """Planted clusters: every vector lands in the numpy-argmin cell."""
    cents = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [10.0, 10.0]), (2, [0.0, 10.0])],
        "label int, c_arr array<double>",
    )
    vecs = [
        (0, [1.0, 1.0]), (1, [9.0, 11.0]), (2, [-1.0, 9.0]),
        (3, [4.9, 4.9]), (4, [5.1, 5.1]),
    ]
    vdf = spark.createDataFrame(vecs, "vec_id bigint, embedding array<float>")
    got = {r["vec_id"]: r["cell"] for r in vs.assign_cells(vdf, cents).collect()}
    c = np.array([[0, 0], [10, 10], [0, 10]], dtype=float)
    for vid, v in vecs:
        expect = int(np.argmin(((np.array(v) - c) ** 2).sum(axis=1)))
        assert got[vid] == expect, (vid, got[vid], expect)


def test_stream_assignment_matches_batch(spark, tmp_path, centroids):
    """The streamed backlog (2 drops, 1 file per trigger) produces the
    exact same (vec_id, cell, d2) rows as the batch path — same
    function, stream-static broadcast join."""
    from rfb_data_pipeline_spark.catalog import load_tables

    emb = load_tables(
        spark, SF_SMALL, tables=("embeddings",), register_views=False
    )["embeddings"]
    half = emb.agg(F.percentile_approx("vec_id", 0.5)).collect()[0][0]
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    import glob
    import shutil

    for i, part in enumerate(
        (emb.filter(F.col("vec_id") <= half), emb.filter(F.col("vec_id") > half))
    ):
        stage = tmp_path / f"stage{i}"
        part.coalesce(1).write.parquet(str(stage))
        (src,) = glob.glob(str(stage / "*.parquet"))
        shutil.copy(src, in_dir / f"drop{i}.parquet")

    out = str(tmp_path / "out")
    vs.run_vector_ingest(
        spark, str(in_dir), out, str(tmp_path / "ckpt"), centroids
    )
    streamed = {
        r["vec_id"]: (r["cell"], r["d2"])
        for r in spark.read.parquet(out).collect()
    }
    batch = {
        r["vec_id"]: (r["cell"], r["d2"])
        for r in vs.assign_cells(emb, centroids).collect()
    }
    assert streamed == batch
    # two micro-batches really ran
    assert len({r["_batch_id"] for r in spark.read.parquet(out).collect()}) == 2
