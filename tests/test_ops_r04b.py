"""Intent tests for the second-half round-4 operators (x12, s12).

Oracle parity proves Spark == DuckDB; these fixtures pin the actual
decision semantics on constructed inputs with known right answers.
"""

from __future__ import annotations

import pytest

from rfb_data_pipeline_spark.operators.dedup import SPAN_TOKENS
from rfb_data_pipeline_spark.operators.sampling import x12_repetition_gate
from rfb_data_pipeline_spark.operators.similarity import (
    s12_embedding_outliers,
)


def _toks(prefix: str, n: int) -> str:
    return " ".join(f"{prefix}{i}" for i in range(n))


@pytest.fixture(scope="module")
def gate_dir(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("x12")
    shared = " ".join(f"dup{i}" for i in range(SPAN_TOKENS + 8))
    rows = [
        # clean doc: unique tokens, no repetition → kept
        (0, _toks("a", 40), "en", "clean"),
        # intra-doc repetition: one token over and over → top_token_frac
        # 1.0 and dup_bigram_frac ~1 → flagged intra
        (1, " ".join(["spam"] * 40), "en", "spammy"),
        # cross-doc duplication: two docs sharing a long span → both
        # flagged cross (dup fraction > 0.2 of their windows)
        (2, shared + " " + _toks("b", 2), "en", "copied"),
        (3, shared + " " + _toks("c", 2), "en", "copied"),
        # 1-token doc: too short for any repetition signal — must still
        # be AUDITED (counted + kept), not silently dropped
        (4, "solo", "en", "clean"),
    ]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string"
    ).write.parquet(str(tmp / "documents.parquet"))
    return str(tmp)


def test_x12_gate_decisions(spark, gate_dir):
    out = {r["source"]: r for r in x12_repetition_gate(spark, gate_dir).collect()}
    # the 1-token doc is audited and kept (no measurable repetition),
    # never silently dropped from the denominator
    assert out["clean"]["n_docs"] == 2
    assert out["clean"]["n_kept"] == 2
    assert out["clean"]["n_flag_cross"] == 0
    assert out["clean"]["n_flag_intra"] == 0
    assert out["spammy"]["n_flag_intra"] == 1
    assert out["spammy"]["n_kept"] == 0
    assert out["copied"]["n_flag_cross"] == 2
    assert out["copied"]["n_kept"] == 0
    # kept tokens come only from kept docs (40 + 1 for "solo")
    assert out["clean"]["tokens_kept"] == 41
    assert out["copied"]["tokens_kept"] == 0


def test_x12_thresholds_are_parameters(spark, gate_dir):
    # loosen every threshold to 1.0: nothing can exceed it except the
    # all-dup docs whose fractions equal 1.0 (strict > keeps them too)
    out = {
        r["source"]: r
        for r in x12_repetition_gate(
            spark, gate_dir,
            max_cross_dup=1.0, max_dup_bigram=1.0, max_top_token=1.0,
        ).collect()
    }
    assert all(r["n_kept"] == r["n_docs"] for r in out.values())


@pytest.fixture(scope="module")
def outlier_dir(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("s12")
    rows = []
    # label 0: 40 tight vectors + 1 planted far outlier
    for i in range(40):
        rows.append((i, [0.5 + 0.001 * (i % 5), 0.5, 0.25, 0.75], 0))
    rows.append((40, [9.0, -9.0, 9.0, -9.0], 0))
    # label 1: uniform cloud, no planted outlier
    for i in range(30):
        rows.append((100 + i, [0.1 * (i % 10), 0.2, 0.3, 0.4], 1))
    # label 2: a singleton — variance is exactly 0 (the 0/0 guard case)
    rows.append((200, [1.0, 2.0, 3.0, 4.0], 2))
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).write.parquet(str(tmp / "embeddings.parquet"))
    return str(tmp)


def test_s12_flags_planted_outlier(spark, outlier_dir):
    out = {r["label"]: r for r in s12_embedding_outliers(spark, outlier_dir).collect()}
    # the planted vector dominates label 0's variance → exactly it is
    # beyond 2 sigma
    assert out[0]["n_vecs"] == 41
    assert out[0]["n_outliers"] == 1
    assert out[0]["max_z"] > 2.0
    # the uniform cloud has no >2-sigma member
    assert out[1]["n_outliers"] == 0
    # singleton label: var == 0 → z defined as 0, no NULLs, no outliers
    assert out[2]["n_vecs"] == 1
    assert out[2]["n_outliers"] == 0
    assert out[2]["max_z"] == 0.0


def test_x13_matches_python_model_and_weights_bias(spark):
    """x13's deterministic Efraimidis-Spirakis selection equals a
    Python model computing the same keys, and selection is
    weight-biased: heavy docs are overrepresented relative to their
    population share."""
    import hashlib
    import math

    import duckdb

    from rfb_data_pipeline_spark.operators.sampling import (
        WEIGHTED_K,
        _U_DIGITS,
        x13_weighted_sample,
    )

    sf = "/root/testdata/sf0.01"
    rows = duckdb.sql(
        f"SELECT doc_id, lang, n_chars FROM read_parquet('{sf}/documents.parquet')"
    ).fetchall()

    def key(doc_id: int, w: int) -> float:
        h = hashlib.md5(str(doc_id).encode()).hexdigest()[:_U_DIGITS]
        u = (int(h, 16) + 1) / float(16**_U_DIGITS)
        return round(math.log(u) / w, 12)

    ranked = sorted(rows, key=lambda r: (-key(r[0], r[2]), r[0]))[:WEIGHTED_K]
    model = {}
    for doc_id, lang, n_chars in ranked:
        agg = model.setdefault(lang, [0, 0, 0])
        agg[0] += 1
        agg[1] += n_chars
        agg[2] += doc_id

    got = {
        r["lang"]: [r["n_selected"], r["chars_selected"], r["sel_checksum"]]
        for r in x13_weighted_sample(spark, sf).collect()
    }
    assert got == model

    # weight bias: the sample's mean doc length exceeds the corpus mean
    corpus_mean = sum(r[2] for r in rows) / len(rows)
    sample_mean = sum(r[2] for r in ranked) / len(ranked)
    assert sample_mean > corpus_mean


def test_t14_catches_word_salad_that_t11_cannot(spark, tmp_path):
    """Bigram surprisal separates coherent word ORDER from word salad
    built of the same vocabulary; unigram surprisal (t11) is blind to
    it — identical unigram profiles score identically there."""
    from rfb_data_pipeline_spark.operators.text import (
        t11_unigram_surprisal,
        t14_bigram_surprisal,
    )

    phrase = "the cat sat on the mat and the dog ran in the park all day"
    salad = "mat the dog the on sat day all in cat the ran park and the"
    rows = [(i, phrase, "en", "s") for i in range(20)]
    rows.append((100, salad, "en", "s"))  # same multiset of tokens
    d = str(tmp_path / "t14")
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string"
    ).write.parquet(d + "/documents.parquet")

    t14 = {r["doc_id"]: r["avg_surprisal_nats"]
           for r in t14_bigram_surprisal(spark, d).collect()}
    t11 = {r["doc_id"]: r["avg_surprisal_nats"]
           for r in t11_unigram_surprisal(spark, d).collect()}
    # same unigrams → t11 identical; scrambled order → t14 much higher
    assert t11[100] == t11[0]
    assert t14[100] > t14[0] + 1.0
