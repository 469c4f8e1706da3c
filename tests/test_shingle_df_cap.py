"""Skew fixture for the exact-tier shingle df-cap (VERDICT r04 item 4).

A real crawl has boilerplate shingles with document frequency in the
millions; each contributes df^2/2 candidate rows to d02's exact
shingle equi-join. The fixture plants one boilerplate phrase in EVERY
doc (df = 3 x SHINGLE_DF_CAP) plus genuine near-dup pairs, and pins:

* the cap drops exactly the hot shingles (candidate mass bounded);
* near-dup recall at the threshold is unchanged — d02 (capped exact)
  and d03 (banded LSH) both still return exactly the planted pairs;
* Spark-vs-DuckDB parity holds for d02/d09 ON the skewed corpus, so
  the cap is mirrored, not Spark-only.
"""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from rfb_data_pipeline_spark.operators.dedup import (
    SHINGLE_DF_CAP,
    _capped_shingles,
    _doc_shingles,
)
from tools.check_oracle import _normalize, value_hash

N_DOCS = 3 * SHINGLE_DF_CAP  # 300: boilerplate df is 3x over the cap
BOILER = "copyright example corp all rights reserved"  # 6 tokens -> 4 hot shingles
N_PLANTED = 5  # near-dup pairs (docs 2j / 2j+1 for j < N_PLANTED)


def _filler(i: int) -> str:
    return " ".join(f"w{i}t{k}" for k in range(30))


@pytest.fixture(scope="module")
def skew_dir(spark, tmp_path_factory):
    rows = []
    for i in range(N_DOCS):
        if i < 2 * N_PLANTED:
            # pairs (0,1), (2,3), ...: same filler, one token edited —
            # capped-set Jaccard stays >= 0.8
            base = _filler(i // 2).split()
            if i % 2 == 1:
                base[15] = "EDITED"
            body = " ".join(base)
        else:
            body = _filler(i)
        text = body + " " + BOILER
        rows.append((i, text, "en", f"src{i % 4}", len(text)))
    tmp = tmp_path_factory.mktemp("shingle_skew")
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.parquet(str(tmp / "documents.parquet"))
    return str(tmp)


@pytest.fixture(scope="module")
def skew_duck(skew_dir):
    con = duckdb.connect()
    p = os.path.join(skew_dir, "documents.parquet")
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    yield con
    con.close()


def test_cap_drops_exactly_the_hot_shingles(spark, skew_dir):
    raw = _doc_shingles(
        spark.read.parquet(os.path.join(skew_dir, "documents.parquet"))
    ).cache()
    capped = _capped_shingles(raw)
    hot = (
        raw.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > SHINGLE_DF_CAP)
    )
    hot_rows = hot.collect()
    # the boilerplate's 4 internal shingles are corpus-wide hot
    # (df = N_DOCS); the boundary shingles straddle unique filler
    assert {r["df"] for r in hot_rows} == {N_DOCS}
    assert len(hot_rows) == 4
    n_raw, n_capped = raw.count(), capped.count()
    assert n_raw - n_capped == 4 * N_DOCS
    assert capped.join(hot.select("shingle"), "shingle", "left_semi").count() == 0
    raw.unpersist()


def test_candidate_mass_bounded_and_recall_unchanged(spark, skew_dir):
    qs = entry_mod.queries()
    planted = {(2 * j, 2 * j + 1) for j in range(N_PLANTED)}
    d02 = {
        (r["doc_a"], r["doc_b"])
        for r in qs["d02_ngram_jaccard"](spark, skew_dir).collect()
    }
    # UNCAPPED, the hot shingles alone would emit C(300,2) = 44850
    # candidate pairs; capped, only the genuinely-similar pairs
    # survive candidate generation at all
    assert d02 == planted
    d03 = {
        (r["doc_a"], r["doc_b"])
        for r in qs["d03_minhash_lsh"](spark, skew_dir).collect()
    }
    assert planted <= d03, "LSH lost a planted near-dup pair"
    # LSH may keep boilerplate-only pairs out via banding already;
    # whatever it returns at the threshold must be verified-exact
    for a, b in d03 - planted:
        raise AssertionError(f"unexpected pair above threshold: {(a, b)}")


@pytest.mark.parametrize("name", ["d02_ngram_jaccard", "d09_containment"])
def test_capped_tier_parity_on_skewed_corpus(spark, skew_dir, skew_duck, name):
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    spdf = qs[name](spark, skew_dir).toPandas()
    opdf = skew_duck.execute(oracles[name]).fetchdf()
    assert sorted(spdf.columns) == sorted(opdf.columns)
    assert len(spdf) == len(opdf), (len(spdf), len(opdf))
    assert value_hash(_normalize(spdf)) == value_hash(_normalize(opdf))
