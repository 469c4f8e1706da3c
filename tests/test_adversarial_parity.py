"""Differential Spark-vs-DuckDB checks on an ADVERSARIAL corpus.

The oracle gate proves parity on the shipped synthetic corpus; these
fixtures probe the places engines classically diverge — whitespace
classes, unicode, case folding, digit-heavy text — over the
normalization/tokenization-sensitive queries. Divergence here would
be invisible at the driver until testdata happened to contain the
trigger.
"""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entry_mod
from tools.check_oracle import _normalize, value_hash

_QUERIES = entry_mod.queries()
_ORACLES = entry_mod.oracle_sql()

# queries over documents that exercise trim/split/lower/regexp paths
_PROBED = [
    "d01_exact_dedup",
    "e16_stream_replay",
    "t01_token_stats",
    "t02_quality_score",
    "t04_fingerprint",
    "t13_pii_redaction",
    "x01_split_assign",
    "t03_langid",
    "t07_repetition",
    "d13_duplicate_spans",
    "t05_top_terms",
    "t09_bpe_token_count",
    "t11_unigram_surprisal",
    "t14_bigram_surprisal",
    "d02_ngram_jaccard",
    "x05_corpus_curation",
    "x13_weighted_sample",
    "t15_quality_classifier",  # single-class seed → smoothed-prior path
    "t16_html_extract",  # markup metachars inside source text
    "x14_epoch_plan",  # lang outside the mixture → part-0 path
    "t17_url_filter",  # synthesized-URL extraction over odd sources
    "x15_split_drift",  # splits with EMPTY sides on a tiny corpus
]

_ROWS = [
    # doc_id, text, lang, source
    (1, "the quick  brown\tfox  jumps over a lazy dog in the warm sun",
     "en", "ws"),  # double spaces + tab
    (2, "THE QUICK  BROWN\tFOX  JUMPS OVER A LAZY DOG IN THE WARM SUN",
     "en", "ws"),  # case-folded duplicate of 1
    (3, "  the quick  brown\tfox  jumps over a lazy dog in the warm sun  ",
     "en", "ws"),  # leading/trailing space duplicate of 1
    (4, "o rápido café naïve señor Zürich über ação 123 of the day",
     "pt", "uni"),  # accented unicode
    (5, "1 2 3 4 5 6 7 8 9 0 11 22 33 44 55 66 77 88 99 00", "en", "num"),
    (6, "the of to and in is it a " * 5, "en", "stop"),  # all stopwords
    (7, "solo", "en", "tiny"),  # single token
    (8, "the " + "x" * 500 + " of it is done and so the story ends here now",
     "en", "long"),  # one huge token
    (9, "汉字 かな 한글 emoji 🚀 mixed with the latin of it all right here now",
     "zh", "cjk"),  # CJK + emoji tokens
    (10, " ".join(f"w{i}" for i in range(40)) + " " +
     " ".join(f"w{i}" for i in range(40)), "en", "span"),  # long internal repeat
    (11, " ".join(f"w{i}" for i in range(40)) + " tail marker one two three",
     "en", "span"),  # shares a 40-token run with 10 (d13 cross-doc span)
]


@pytest.fixture(scope="module")
def adv_dir(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("adv")
    df = spark.createDataFrame(
        [(i, t, lg, s, len(t)) for (i, t, lg, s) in _ROWS],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    df.coalesce(1).write.parquet(str(tmp / "documents.parquet"))
    return str(tmp)


@pytest.fixture(scope="module")
def adv_duck(adv_dir):
    con = duckdb.connect()
    p = os.path.join(adv_dir, "documents.parquet")
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}/*.parquet')")
    yield con
    con.close()


@pytest.mark.parametrize("name", _PROBED)
def test_adversarial_corpus_parity(spark, adv_dir, adv_duck, name):
    spdf = _QUERIES[name](spark, adv_dir).toPandas()
    opdf = adv_duck.execute(_ORACLES[name]).fetchdf()
    assert sorted(spdf.columns) == sorted(opdf.columns)
    assert len(spdf) == len(opdf), (len(spdf), len(opdf))
    sn, on = _normalize(spdf), _normalize(opdf)
    if value_hash(sn) != value_hash(on):
        diff = next((a, b) for a, b in zip(sn, on) if a != b)
        raise AssertionError(
            f"value mismatch, first diff spark={diff[0]} duckdb={diff[1]}"
        )
