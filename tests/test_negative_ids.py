"""Differential Spark-vs-DuckDB probe on a corpus with NEGATIVE (and
zero) doc_ids.

Nothing guarantees upstream ids are non-negative (a signed-hash doc
key is the common producer), and sign-keeping ``%`` is the repo's
most re-found bug class: Spark and DuckDB AGREE on remainder sign
(both keep the dividend's), but any expression that feeds ``id % k``
into a positional builtin (element_at / sequence / array index)
diverges or crashes exactly once ids go negative — m06 (r04) and t17
(r05 ADVICE) were real instances. This probe runs every document
query on a mixed-sign corpus and compares engines, so the NEXT
instance fails a test instead of an audit.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from tests.test_degenerate_corpus import (
    _ORACLES,
    _PROBED,
    _QUERIES,
)
from tools.check_oracle import _normalize, value_hash

_TEXTS = [
    "the quick brown fox jumps over a lazy dog in the sun today",
    "a small cat sat on the warm mat and looked at the open door",
    "numbers like 12 and 99 appear here but the text is mostly words",
    "the quick brown fox jumps over a lazy dog in the sun today",  # dup
    "rain falls on the green hills while the river runs to the sea",
    "it is a truth universally acknowledged that a reader wants text",
    "the small cat sat on the warm mat and looked at the shut door",
    "words words words repeated words words make a repetitive doc",
    "every good corpus needs one more ordinary sentence to fill it",
    "the rain in spain stays mainly in the plain as the saying goes",
]
# ids straddle zero, include both parities and all %3/%5/%7 classes
_IDS = [-9, -7, -4, -3, -2, -1, 0, 1, 2, 6]


@pytest.fixture(scope="module")
def neg_dir(spark, tmp_path_factory):
    rows = [
        (i, t, "en", f"s{abs(i) % 3}", len(t))
        for i, t in zip(_IDS, _TEXTS)
    ]
    tmp = tmp_path_factory.mktemp("negative_ids")
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.parquet(str(tmp / "documents.parquet"))
    return str(tmp)


@pytest.fixture(scope="module")
def neg_duck(neg_dir):
    con = duckdb.connect()
    p = os.path.join(neg_dir, "documents.parquet")
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", _PROBED)
def test_negative_id_parity(spark, neg_dir, neg_duck, name):
    spdf = _QUERIES[name](spark, neg_dir).toPandas()
    opdf = neg_duck.execute(_ORACLES[name]).fetchdf()
    assert sorted(spdf.columns) == sorted(opdf.columns)
    assert len(spdf) == len(opdf), (len(spdf), len(opdf))
    sn, on = _normalize(spdf), _normalize(opdf)
    if value_hash(sn) != value_hash(on):
        diff = next((a, b) for a, b in zip(sn, on) if a != b)
        raise AssertionError(
            f"value mismatch, first diff spark={diff[0]} duckdb={diff[1]}"
        )
