"""Intent tests for s10 (SemDeDup): the cluster-scoped drop rule.

Oracle parity proves Spark == DuckDB; these fixtures prove the
semantics — a near-identical pair in the SAME cluster drops the
higher id, an identical pair in DIFFERENT clusters is untouched
(SemDeDup is deliberately cluster-local), and orthogonal vectors
survive.
"""

from __future__ import annotations

import pytest

from rfb_data_pipeline_spark.operators.similarity import DIM, s10_semantic_dedup


def _vec(axis: int, scale: float = 1.0) -> list[float]:
    v = [0.0] * DIM
    v[axis] = scale
    return v


@pytest.fixture(scope="module")
def s10_dir(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("s10")
    rows = [
        # cluster 0: vecs 0 and 1 colinear (cos 1.0) -> 1 dropped;
        # vec 2 orthogonal -> kept
        (0, _vec(0, 1.0), 0),
        (1, _vec(0, 2.0), 0),
        (2, _vec(1, 1.0), 0),
        # cluster 1: vec 3 identical to vec 0 but in ANOTHER cluster ->
        # kept (cluster-local rule); vec 4 orthogonal -> kept
        (3, _vec(0, 1.0), 1),
        (4, _vec(2, 1.0), 1),
    ]
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).write.parquet(str(tmp / "embeddings.parquet"))
    return str(tmp)


def test_s10_drop_rule_is_cluster_local(spark, s10_dir):
    got = {r["label"]: r for r in s10_semantic_dedup(spark, s10_dir).collect()}
    assert got[0]["n_vecs"] == 3
    assert got[0]["n_dropped"] == 1  # vec 1 (higher id of the colinear pair)
    assert got[0]["n_kept"] == 2
    assert got[1]["n_vecs"] == 2
    assert got[1]["n_dropped"] == 0  # identical to vec 0, but other cluster
    assert got[1]["n_kept"] == 2
