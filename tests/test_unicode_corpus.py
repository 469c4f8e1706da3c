"""Differential Spark-vs-DuckDB probe on a UNICODE-heavy corpus: CJK
(no spaces), emoji (astral plane), combining marks, accented Latin,
ideographic space U+3000, tabs/newlines, and RTL text.

A 100 TB crawl is mostly NOT ASCII. The document operators lean on
length(), regexp '\\s+' splits, substring, lower() and md5() — all
places where two engines can disagree on code-point vs code-unit
counting, Unicode-aware case folding, or whitespace classes. This
probe pins that both engines agree on the ENTIRE registered document
surface for such text; any future operator built on a diverging
primitive fails here instead of in an audit.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from tests.test_degenerate_corpus import _ORACLES, _PROBED, _QUERIES
from tools.check_oracle import _normalize, value_hash

_TEXTS = [
    # CJK, no spaces — one giant "token" under whitespace rules
    "数据管道在大规模语料库上运行去重和质量过滤然后输出训练数据",
    # emoji (astral plane) mixed with words
    "the 🚀 rocket and the 🐍 snake share a 🌍 world of text 🎉 today",
    # combining marks (e + U+0301) vs precomposed é
    "résumé and résumé look alike but differ in code points",
    # ideographic space U+3000 between CJK words
    "東京　大阪　京都 are joined by ideographic spaces here",
    # tabs and newlines as separators
    "tab\tseparated\twords\nand\nnewline\nseparated\nwords here too",
    # RTL Arabic with Latin mixed in
    "البيانات الكبيرة need dedup too قال المهندس yesterday",
    # accented Latin, uppercase (lower() folding)
    "ÀÉÎÕÜ Ça Garçon Straße Ärger ÅNGSTRÖM über alles façade",
    # near-dup pair of the emoji doc (one token edited)
    "the 🚀 rocket and the 🐍 snake share a 🌍 world of text 🎉 tonight",
    # Greek + Cyrillic homoglyphs
    "α β γ δ mixed with а б в г look similar but hash differently",
    "plain ascii control sentence for the baseline comparison here",
]


@pytest.fixture(scope="module")
def uni_dir(spark, tmp_path_factory):
    rows = [
        (i + 1, t, "xx", f"s{i % 3}", len(t)) for i, t in enumerate(_TEXTS)
    ]
    tmp = tmp_path_factory.mktemp("unicode_corpus")
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.parquet(str(tmp / "documents.parquet"))
    return str(tmp)


@pytest.fixture(scope="module")
def uni_duck(uni_dir):
    con = duckdb.connect()
    p = os.path.join(uni_dir, "documents.parquet")
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", _PROBED)
def test_unicode_corpus_parity(spark, uni_dir, uni_duck, name):
    spdf = _QUERIES[name](spark, uni_dir).toPandas()
    opdf = uni_duck.execute(_ORACLES[name]).fetchdf()
    assert sorted(spdf.columns) == sorted(opdf.columns)
    assert len(spdf) == len(opdf), (len(spdf), len(opdf))
    sn, on = _normalize(spdf), _normalize(opdf)
    if value_hash(sn) != value_hash(on):
        diff = next((a, b) for a, b in zip(sn, on) if a != b)
        raise AssertionError(
            f"value mismatch, first diff spark={diff[0]} duckdb={diff[1]}"
        )
