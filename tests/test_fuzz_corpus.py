"""Seeded random-corpus differential probe: the whole document-query
surface (the `_PROBED` set) compared Spark-vs-DuckDB over corpora a
fixed PRNG generates — the same engine-parity check the four
hand-built probes (degenerate / negative-id / unicode / shingle-skew)
run, but with combinatorial coverage those fixtures can't enumerate:
random near-dup families at varying edit distances, exact dup runs,
digit-heavy and stopword-free quality outliers, skewed source/lang
marginals, and ids straddling zero — all in one table.

Seeds are FIXED so failures reproduce; the corpus is built with
``random.Random(seed)`` only (no time, no os.urandom)."""

from __future__ import annotations

import os
import random

import duckdb
import pytest

from tests.test_degenerate_corpus import _ORACLES, _PROBED, _QUERIES
from tools.check_oracle import _normalize, value_hash

_VOCAB = (
    "the a of to and in is it rain sun hill river cat dog fox reader "
    "corpus text words sentence ordinary green warm small quick lazy "
    "door mat sea plain spain truth universally acknowledged repeated "
    "needs fills runs looks appears mostly numbers"
).split()
_SPICE = ["12", "99", "2026", "café", "naïve", "東京", "🌧️", "&amp;", "x@y.z"]


def _make_corpus(seed: int, n_docs: int = 64) -> list[tuple]:
    rng = random.Random(seed)
    rows: list[tuple] = []
    # a few template docs that near-dup families derive from
    templates = [
        [rng.choice(_VOCAB) for _ in range(rng.randint(14, 30))]
        for _ in range(4)
    ]
    # ids straddle zero and skip irregularly (hits every %2/%3/%5/%7
    # class without being an arithmetic sequence)
    doc_id = -rng.randint(5, 9)
    for i in range(n_docs):
        doc_id += rng.randint(1, 3)
        kind = rng.random()
        if kind < 0.25:  # near-dup of a template: drop/replace a few tokens
            toks = list(rng.choice(templates))
            for _ in range(rng.randint(0, 4)):
                j = rng.randrange(len(toks))
                if rng.random() < 0.5:
                    toks[j] = rng.choice(_VOCAB)
                else:
                    toks.pop(j)
        elif kind < 0.35:  # exact dup of a template
            toks = list(rng.choice(templates))
        elif kind < 0.42:  # digit-heavy low-quality doc
            toks = [str(rng.randint(0, 9999)) for _ in range(rng.randint(8, 20))]
        elif kind < 0.48:  # stopword-free short doc
            toks = [rng.choice(_VOCAB[8:]) for _ in range(rng.randint(1, 9))]
        else:  # ordinary doc with occasional spice tokens
            toks = [
                rng.choice(_SPICE) if rng.random() < 0.06 else rng.choice(_VOCAB)
                for _ in range(rng.randint(10, 40))
            ]
        text = " ".join(toks)
        if kind >= 0.98:
            text = None
        lang = rng.choice(["en", "en", "en", "pt", "de"])
        source = rng.choice(["web", "web", "wiki", "books"])
        rows.append((doc_id, text, lang, source, len(text) if text else 0))
    return rows


@pytest.fixture(scope="module", params=[11, 47])
def fuzz_env(request, spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp(f"fuzz{request.param}")
    spark.createDataFrame(
        _make_corpus(request.param),
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).coalesce(1).write.parquet(str(tmp / "documents.parquet"))
    con = duckdb.connect()
    p = os.path.join(str(tmp), "documents.parquet")
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    yield str(tmp), con
    con.close()


@pytest.mark.parametrize("name", _PROBED)
def test_fuzz_corpus_parity(spark, fuzz_env, name):
    fuzz_dir, con = fuzz_env
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


def test_fuzz_corpus_is_nonvacuous(spark, fuzz_env):
    """The generated corpus must actually exercise the interesting
    paths: near-dup pairs exist and ids straddle zero — otherwise the
    parity above proves less than it claims."""
    fuzz_dir, con = fuzz_env
    from rfb_data_pipeline_spark.operators.dedup import d02_ngram_jaccard

    assert d02_ngram_jaccard(spark, fuzz_dir).count() >= 2
    rows = spark.read.parquet(fuzz_dir + "/documents.parquet")
    ids = [r[0] for r in rows.select("doc_id").collect()]
    assert min(ids) < 0 < max(ids)
