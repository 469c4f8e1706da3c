"""Degenerate embeddings: NULL vectors, zero vectors, wrong
dimensions. The cosine operators' documented precondition is enforced
by the s14 validation gate; this suite pins (a) the gate's counts and
engine parity, (b) that the tolerant operators (s04/s09/s12) keep
engine parity even on degenerate input, and (c) that gating then
running a cosine operator works end-to-end."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from tools.check_oracle import _normalize, value_hash

_QUERIES = entry_mod.queries()
_ORACLES = entry_mod.oracle_sql()

DIM = 64


def _finite_rows():
    rows = []
    for vid in range(12):
        rows.append(
            (vid, [float(math.sin(vid + 3 * i)) for i in range(DIM)], vid % 3)
        )
    rows.append((20, [0.0] * DIM, 1))  # zero vector
    rows.append((21, None, 2))  # NULL embedding
    rows.append((22, [1.0] * 16, 0))  # wrong dimension
    return rows


def _rows():
    # NON-FINITE garbage on top: NaN semantics legitimately differ
    # across engines (NULL-skipping sums, NaN formatting), which is
    # exactly why the gate must remove these rows before ANY operator
    rows = _finite_rows()
    rows.append((23, [float("nan")] * DIM, 1))  # NaN vector
    rows.append((24, [float("inf")] + [1.0] * (DIM - 1), 2))  # Inf element
    rows.append((25, [1.0] * (DIM - 1) + [None], 0))  # NULL element
    return rows


@pytest.fixture(scope="module")
def deg_dir(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("deg_emb")
    spark.createDataFrame(
        _rows(), "vec_id bigint, embedding array<float>, label int"
    ).coalesce(1).write.parquet(str(tmp / "embeddings.parquet"))
    return str(tmp)


@pytest.fixture(scope="module")
def finite_deg_dir(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("deg_emb_finite")
    spark.createDataFrame(
        _finite_rows(), "vec_id bigint, embedding array<float>, label int"
    ).coalesce(1).write.parquet(str(tmp / "embeddings.parquet"))
    return str(tmp)


@pytest.fixture(scope="module")
def finite_deg_duck(finite_deg_dir):
    con = duckdb.connect()
    p = os.path.join(finite_deg_dir, "embeddings.parquet")
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    yield con
    con.close()


def test_s14_counts_every_defect_class(spark, deg_dir):
    from rfb_data_pipeline_spark.operators.similarity import (
        s14_embedding_validation,
    )

    row = s14_embedding_validation(spark, deg_dir).collect()[0]
    assert row["n_vectors"] == 18
    assert row["n_null"] == 1
    assert row["n_zero_norm"] == 1
    assert row["n_wrong_dim"] == 1
    assert row["n_non_finite"] == 3  # NaN vector, Inf element, NULL element
    assert row["n_valid"] == 12
    # the defect classes PARTITION the total — nothing slips through
    assert (
        row["n_null"]
        + row["n_wrong_dim"]
        + row["n_non_finite"]
        + row["n_zero_norm"]
        + row["n_valid"]
        == row["n_vectors"]
    )


@pytest.mark.parametrize(
    "name",
    ["s14_embedding_validation", "s04_label_centroids", "s09_vector_stats"],
)
def test_tolerant_operators_keep_parity_on_finite_degenerate_input(
    spark, finite_deg_dir, finite_deg_duck, name
):
    """Parity holds through NULL/zero/wrong-dim rows; the NON-finite
    classes are excluded here because NaN semantics differ across
    engines by design — the gate removes them before any operator."""
    spdf = _QUERIES[name](spark, finite_deg_dir).toPandas()
    opdf = finite_deg_duck.execute(_ORACLES[name]).fetchdf()
    assert sorted(spdf.columns) == sorted(opdf.columns)
    assert len(spdf) == len(opdf)
    sn, on = _normalize(spdf), _normalize(opdf)
    assert value_hash(sn) == value_hash(on), next(
        (a, b) for a, b in zip(sn, on) if a != b
    )


def test_gate_then_cosine_operator_end_to_end(spark, deg_dir, tmp_path):
    """Filtering with the gate's predicate makes the cosine surface
    safe: s01 crashes on the raw degenerate table (the documented
    precondition) but runs clean on the gated table and returns the
    true neighbors."""
    from rfb_data_pipeline_spark.operators.similarity import (
        s01_knn_bruteforce,
        valid_embedding_pred,
    )

    with pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
        s01_knn_bruteforce(spark, deg_dir).collect()

    clean_dir = str(tmp_path / "clean")
    (
        spark.read.parquet(deg_dir + "/embeddings.parquet")
        .filter(valid_embedding_pred())
        .coalesce(1)
        .write.parquet(clean_dir + "/embeddings.parquet")
    )
    out = s01_knn_bruteforce(spark, clean_dir).collect()
    assert len(out) == 10
    assert all(r["vec_id"] not in (20, 21, 22, 23, 24, 25) for r in out)


def test_s03_blocked_scan_fails_loud_on_degenerate_input(
    spark, deg_dir, tmp_path
):
    """The blocked numpy form keeps the cosine surface's fail-loud
    precondition: numpy would silently emit Inf/NaN where the old
    ANSI expression crashed on zero-norm vectors — the UDF raises
    instead, and the gated table runs clean."""
    from rfb_data_pipeline_spark.operators.similarity import (
        s03_near_dup_pairs,
        valid_embedding_pred,
    )

    with pytest.raises(Exception, match="zero-norm or non-finite"):
        s03_near_dup_pairs(spark, deg_dir).collect()

    clean_dir = str(tmp_path / "clean_s03")
    (
        spark.read.parquet(deg_dir + "/embeddings.parquet")
        .filter(valid_embedding_pred())
        .coalesce(1)
        .write.parquet(clean_dir + "/embeddings.parquet")
    )
    out = s03_near_dup_pairs(spark, clean_dir).collect()
    assert all(r["vec_a"] < r["vec_b"] for r in out)
