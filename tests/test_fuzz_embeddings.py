"""Seeded random-embeddings differential probe: the whole
oracle-paired similarity surface (s01–s15) compared Spark-vs-DuckDB
over vector corpora a fixed PRNG generates — the fourth fuzz axis
(documents, events, relational, now embeddings). The generator keeps
the corpus contract (finite float32 vectors, dim 64, labels) but
plants the structure the fixed corpus underrepresents: exact
duplicate vectors, near-duplicates straddling the cosine threshold,
antipodal and orthogonal pairs, a common-prefix family (high dot,
diverging tails), wildly mixed norms (cosine must be scale-free) and
tight label clusters with one off-cluster impostor each.

Both engines read the SAME parquet file, so float32 quantization is
identical by construction; expression parity (same left-to-right
array sums on both sides) is what the probe pins."""

from __future__ import annotations

import math
import os
import random

import duckdb
import pytest

from tests.test_degenerate_corpus import _ORACLES, _QUERIES
from tools.check_oracle import _normalize, value_hash

_PROBED_S = [n for n in _QUERIES if n.startswith("s") and n in _ORACLES]

DIM = 64


def _unit(rng: random.Random) -> list[float]:
    v = [rng.gauss(0.0, 1.0) for _ in range(DIM)]
    n = math.sqrt(sum(x * x for x in v)) or 1.0
    return [x / n for x in v]


def _scale(v: list[float], s: float) -> list[float]:
    return [x * s for x in v]


def _perturb(rng: random.Random, v: list[float], eps: float) -> list[float]:
    return [x + rng.gauss(0.0, eps) for x in v]


def _make_vectors(seed: int) -> list[tuple]:
    rng = random.Random(seed)
    rows: list[tuple] = []
    vid = 0

    def add(vec, label):
        nonlocal vid
        rows.append((vid, [float(x) for x in vec], label))
        vid += 1

    # three tight label clusters + one impostor per cluster
    for lbl in range(3):
        center = _unit(rng)
        for _ in range(6):
            add(_perturb(rng, center, 0.05), lbl)
        add(_unit(rng), lbl)  # impostor: same label, far vector
    # exact duplicates (near-dup detection must fire)
    dup = _unit(rng)
    add(dup, 0)
    add(list(dup), 1)
    # near-duplicates at two distances (straddle thresholds)
    base = _unit(rng)
    add(base, 2)
    add(_perturb(rng, base, 0.01), 2)   # well above any threshold
    add(_perturb(rng, base, 0.4), 2)    # well below
    # antipodal + orthogonal structure
    a = _unit(rng)
    add(a, 0)
    add([-x for x in a], 1)
    ortho = [0.0] * DIM
    ortho[0] = 1.0
    add(ortho, 2)
    ortho2 = [0.0] * DIM
    ortho2[1] = 1.0
    add(ortho2, 0)
    # mixed norms: same direction, scales over 4 orders of magnitude
    d = _unit(rng)
    for s in (0.01, 1.0, 7.3, 120.0):
        add(_scale(d, s), 1)
    # plain random fill
    for _ in range(20):
        add(_scale(_unit(rng), rng.uniform(0.5, 2.0)), rng.randrange(3))
    return rows


@pytest.fixture(scope="module", params=[29, 83])
def fuzz_emb_env(request, spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp(f"fuzzemb{request.param}")
    spark.createDataFrame(
        _make_vectors(request.param),
        "vec_id bigint, embedding array<float>, label int",
    ).coalesce(1).write.parquet(str(tmp / "embeddings.parquet"))
    con = duckdb.connect()
    p = os.path.join(str(tmp), "embeddings.parquet")
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    yield str(tmp), con
    con.close()


@pytest.mark.parametrize("name", _PROBED_S)
def test_fuzz_embeddings_parity(spark, fuzz_emb_env, name):
    fuzz_dir, con = fuzz_emb_env
    spdf = _QUERIES[name](spark, fuzz_dir).toPandas()
    opdf = con.execute(_ORACLES[name]).fetchdf()
    assert sorted(spdf.columns) == sorted(opdf.columns)
    assert len(spdf) == len(opdf), (len(spdf), len(opdf))
    sn, on = _normalize(spdf), _normalize(opdf)
    if value_hash(sn) != value_hash(on):
        diff = next((a, b) for a, b in zip(sn, on) if a != b)
        raise AssertionError(
            f"value mismatch, first diff spark={diff[0]} duckdb={diff[1]}"
        )


def test_fuzz_embeddings_is_nonvacuous(spark, fuzz_emb_env):
    """The planted structure must actually appear: the exact-dup pair
    must be found by the exact pair tier, and the 0.01-perturbed
    near-dup must out-rank the 0.4-perturbed one."""
    fuzz_dir, _ = fuzz_emb_env
    from rfb_data_pipeline_spark.operators.similarity import (
        s03_near_dup_pairs,
    )

    pairs = {
        (r[0], r[1]): r for r in s03_near_dup_pairs(spark, fuzz_dir).collect()
    }
    assert pairs, "no near-dup pairs found on the planted corpus"
