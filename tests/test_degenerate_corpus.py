"""Differential Spark-vs-DuckDB checks on a DEGENERATE corpus: NULL
text, empty text, whitespace-only text, and exact duplicates.

A 100 TB crawl always contains these rows. This probe found (and now
pins the fixes for) three real defects: t02/quality_gate crashed with
ANSI divide-by-zero on empty text, a NULL-text gate propagated NULL
through sums where every SQL twin's CASE yields 0, and x12's
token-count NULL silently dropped NULL-text docs from tokens_kept.
"""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entry_mod
from tools.check_oracle import _normalize, value_hash

_QUERIES = entry_mod.queries()
_ORACLES = entry_mod.oracle_sql()

_PROBED = [
    "d01_exact_dedup",
    "d02_ngram_jaccard",
    "d03_minhash_lsh",
    "d04_simhash",
    "d06_incremental_dedup",
    "d07_dedup_clusters",
    "d08_decontaminate",
    "d09_containment",
    "d13_duplicate_spans",
    "d14_dup_span_fraction",
    "d15_cc_star",
    "d16_incremental_minhash",
    "d17_span_dedup_action",
    "d18_cleaned_corpus",
    "d19_decontaminate_action",
    "d20_incremental_span_dedup",
    "m06_subtitle_parse",
    "m07_id3_tag_parse",
    "m08_wav_header_parse",
    "t01_token_stats",
    "t02_quality_score",  # empty text crashed the gate pre-fix
    "t03_langid",
    "t04_fingerprint",
    "t05_top_terms",
    "t06_tfidf_top_terms",
    "t07_repetition",
    "t08_top_bigrams",
    "t09_bpe_token_count",
    "t10_cms_heavy_hitters",
    "t11_unigram_surprisal",
    "t12_zipf_slope",
    "t13_pii_redaction",
    "t14_bigram_surprisal",
    "t15_quality_classifier",  # NULL-text seed asymmetry pre-fix
    "t16_html_extract",
    "t17_url_filter",
    "t18_posting_lists",
    "t19_bm25_search",
    "x01_split_assign",
    "x02_cap_per_group",
    "x03_stratified_sample",
    "x04_chunk_documents",
    "x05_corpus_curation",  # NULL gate summed differently pre-fix
    "x06_shuffle_shard",
    "x08_split_leakage",
    "x09_pack_sequences",
    "x10_domain_mixture",
    "x11_curriculum_buckets",
    "x12_repetition_gate",  # NULL token count dropped tokens_kept
    "x13_weighted_sample",  # zero-weight doc crashed the key pre-fix
    "x14_epoch_plan",
    "x15_split_drift",
    "x16_quality_mixture",  # t15 scores + inner join over degenerate docs
    "x17_cluster_curation",  # CC labels × t15 scores over exact-dup rows 1/6
    "e16_stream_replay",
    "e18_drift_replay",
    "e19_quality_replay",  # even-half model scoring odd NULL/empty docs
]

_ROWS = [
    (1, "the quick brown fox jumps over a lazy dog in the sun", "en", "a", 52),
    (2, None, "en", "nul", 0),  # NULL text
    (3, "", "en", "emp", 0),  # empty text
    (4, "   ", "en", "ws", 3),  # whitespace-only text
    (5, "the of to and in is it a plain doc here now ok fine", "en", "a", 51),
    (6, "the quick brown fox jumps over a lazy dog in the sun", "en", "a", 52),
]


@pytest.fixture(scope="module")
def deg_dir(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("degenerate")
    spark.createDataFrame(
        _ROWS, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.parquet(str(tmp / "documents.parquet"))
    return str(tmp)


@pytest.fixture(scope="module")
def deg_duck(deg_dir):
    con = duckdb.connect()
    p = os.path.join(deg_dir, "documents.parquet")
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", _PROBED)
def test_degenerate_corpus_parity(spark, deg_dir, deg_duck, name):
    spdf = _QUERIES[name](spark, deg_dir).toPandas()
    opdf = deg_duck.execute(_ORACLES[name]).fetchdf()
    assert sorted(spdf.columns) == sorted(opdf.columns)
    assert len(spdf) == len(opdf), (len(spdf), len(opdf))
    sn, on = _normalize(spdf), _normalize(opdf)
    if value_hash(sn) != value_hash(on):
        diff = next((a, b) for a, b in zip(sn, on) if a != b)
        raise AssertionError(
            f"value mismatch, first diff spark={diff[0]} duckdb={diff[1]}"
        )
