"""Intent tests for d17 (exact-substring dedup ACTION).

The oracle-parity gate proves Spark == DuckDB on the shipped corpus;
these fixtures pin the operator's actual guarantee independently of
both engines:

* the globally FIRST occurrence of a W-token window (min (doc_id, s))
  is KEPT — the first document loses nothing;
* every later occurrence is removed, and overlapping removed windows
  from one duplicated run are union-merged (a run of W + k shared
  tokens costs the later doc exactly W + k tokens, not (k+1) * W);
* a shared run of W - 1 tokens triggers no removal at all.
"""

from __future__ import annotations

import pytest

import hashlib

from rfb_data_pipeline_spark.operators.dedup import (
    EXCERPT_TOKENS,
    SPAN_TOKENS,
    d17_span_dedup_action,
    d18_cleaned_corpus,
    d19_decontaminate_action,
    d20_incremental_span_dedup,
)


def _tokens(prefix: str, n: int) -> list[str]:
    return [f"{prefix}{i}" for i in range(n)]


@pytest.fixture(scope="module")
def d17_dir(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("d17")
    shared = [f"dup{i}" for i in range(SPAN_TOKENS + 2)]  # W + 2 tokens
    short = [f"sub{i}" for i in range(SPAN_TOKENS - 1)]  # W - 1 tokens
    rows = [
        # docs 0/1 share a W+2 run at different offsets.  doc 0 is the
        # global first occurrence of all 3 of its W-windows, so it
        # keeps every token; doc 1 loses the union = W + 2 tokens.
        (0, " ".join(_tokens("a", 3) + shared + _tokens("b", 9))),
        (1, " ".join(_tokens("c", 11) + shared + _tokens("d", 7))),
        # docs 2/3 share only W-1 tokens: below threshold, untouched.
        (2, " ".join(_tokens("e", 6) + short + _tokens("f", 8))),
        (3, " ".join(_tokens("g", 9) + short + _tokens("h", 6))),
        # unrelated doc: nothing removed.
        (4, " ".join(_tokens("i", 40))),
    ]
    spark.createDataFrame(rows, "doc_id bigint, text string").write.parquet(
        str(tmp / "documents.parquet")
    )
    return str(tmp)


def test_d17_first_copy_kept_union_removed(spark, d17_dir):
    out = {
        r["doc_id"]: r for r in d17_span_dedup_action(spark, d17_dir).collect()
    }
    assert len(out) == 5
    # doc 0: first occurrence of the shared run — keeps everything.
    assert out[0]["tokens_removed"] == 0
    assert out[0]["n_removed_occurrences"] == 0
    assert float(out[0]["kept_frac"]) == 1.0
    # doc 1: 3 overlapping W-windows removed, union = W + 2 (NOT 3W).
    assert out[1]["n_removed_occurrences"] == 3
    assert out[1]["tokens_removed"] == SPAN_TOKENS + 2
    assert (
        out[1]["tokens_kept"] == out[1]["n_tokens"] - (SPAN_TOKENS + 2)
    )
    # sub-threshold run and the unrelated doc: untouched.
    for d in (2, 3, 4):
        assert out[d]["tokens_removed"] == 0
        assert float(out[d]["kept_frac"]) == 1.0


def test_d17_disjoint_runs_sum_not_merge(spark, tmp_path):
    # doc 1 duplicates TWO separate runs of doc 0, far apart: two
    # islands whose coverages ADD (2W), not one merged interval.
    run_a = [f"p{i}" for i in range(SPAN_TOKENS)]
    run_b = [f"q{i}" for i in range(SPAN_TOKENS)]
    rows = [
        (0, " ".join(run_a + _tokens("x", 5) + run_b)),
        (1, " ".join(_tokens("y", 4) + run_a + _tokens("z", 20) + run_b)),
    ]
    spark.createDataFrame(rows, "doc_id bigint, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {
        r["doc_id"]: r
        for r in d17_span_dedup_action(spark, str(tmp_path)).collect()
    }
    assert out[0]["tokens_removed"] == 0
    assert out[1]["n_removed_occurrences"] == 2
    assert out[1]["tokens_removed"] == 2 * SPAN_TOKENS


def test_d18_reconstructs_exact_kept_text(spark, d17_dir):
    """d18 must emit the md5 of EXACTLY the tokens outside the
    removed intervals, in original order — computed here by an
    independent python model of the same rule."""
    out = {
        r["doc_id"]: r for r in d18_cleaned_corpus(spark, d17_dir).collect()
    }
    assert len(out) == 5
    shared = [f"dup{i}" for i in range(SPAN_TOKENS + 2)]
    # doc 1's expected cleaned text: its own prefix/suffix with the
    # whole shared run excised (the union interval covers it fully).
    doc1_kept = _tokens("c", 11) + _tokens("d", 7)
    expect1 = hashlib.md5(" ".join(doc1_kept).encode()).hexdigest()
    assert out[1]["n_tokens_after"] == len(doc1_kept)
    assert out[1]["cleaned_md5"] == expect1
    # doc 0 (first copy) and the sub-threshold docs: verbatim text.
    doc0_full = _tokens("a", 3) + shared + _tokens("b", 9)
    expect0 = hashlib.md5(" ".join(doc0_full).encode()).hexdigest()
    assert out[0]["n_tokens_after"] == out[0]["n_tokens_before"]
    assert out[0]["cleaned_md5"] == expect0


def test_d18_fully_duplicated_doc_empties(spark, tmp_path):
    # doc 1 IS doc 0 (token-for-token): every window is a later
    # occurrence, the union covers the whole doc, cleaned text is ''.
    run = [f"z{i}" for i in range(SPAN_TOKENS + 4)]
    rows = [(0, " ".join(run)), (1, " ".join(run))]
    spark.createDataFrame(rows, "doc_id bigint, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {
        r["doc_id"]: r
        for r in d18_cleaned_corpus(spark, str(tmp_path)).collect()
    }
    assert out[1]["n_tokens_after"] == 0
    assert out[1]["cleaned_md5"] == hashlib.md5(b"").hexdigest()
    assert out[0]["n_tokens_after"] == len(run)


def test_d19_excises_eval_excerpt_from_carrier_and_source(spark, tmp_path):
    """The eval set is the first EXCERPT_TOKENS tokens of every
    doc_id % 97 == 0 page.  Both the source page itself (self-hit by
    construction) and any other page carrying the excerpt must lose
    exactly the excerpt run; clean pages lose nothing."""
    ev = [f"ev{i}" for i in range(60)]  # eval page: 60 unique tokens
    carrier = _tokens("c", 7) + ev[:EXCERPT_TOKENS] + _tokens("d", 9)
    rows = [
        # doc 0 (0 % 97 == 0): the benchmark's source page
        (0, " ".join(ev), "src_eval"),
        # doc 5: a training page that embeds the excerpt at offset 7
        (5, " ".join(carrier), "src_carrier"),
        # doc 6: clean
        (6, " ".join(_tokens("x", 40)), "src_clean"),
    ]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, source string"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        r["source"]: r
        for r in d19_decontaminate_action(spark, str(tmp_path)).collect()
    }
    # source page: windows s=0..E-W of itself match -> union = E tokens
    assert out["src_eval"]["tokens_removed"] == EXCERPT_TOKENS
    assert out["src_eval"]["n_docs_touched"] == 1
    # carrier: the embedded E-token run excised, nothing else
    assert out["src_carrier"]["tokens_removed"] == EXCERPT_TOKENS
    assert out["src_carrier"]["n_docs_touched"] == 1
    assert out["src_clean"]["tokens_removed"] == 0
    assert out["src_clean"]["n_docs_touched"] == 0


def test_d20_corpus_wins_and_batch_self_dedups(spark, tmp_path):
    """d20's two removal tiers: a batch window matching the CORPUS is
    removed regardless of batch order (corpus-wins), and a
    corpus-unseen run duplicated WITHIN the batch keeps only its
    first batch copy."""
    corpus_run = [f"cr{i}" for i in range(SPAN_TOKENS)]
    novel_run = [f"nv{i}" for i in range(SPAN_TOKENS)]
    rows = [
        # doc 0 (corpus): owns corpus_run
        (0, " ".join(corpus_run + _tokens("a", 5))),
        # doc 1 (batch): carries corpus_run -> removed even though
        # doc 1 precedes doc 3 in the batch
        (1, " ".join(_tokens("b", 4) + corpus_run)),
        # docs 3 & 5 (batch): share novel_run the corpus never saw;
        # doc 3 (first) keeps it, doc 5 loses it
        (3, " ".join(novel_run + _tokens("c", 6))),
        (5, " ".join(_tokens("d", 8) + novel_run)),
    ]
    spark.createDataFrame(rows, "doc_id bigint, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {
        r["doc_id"]: r
        for r in d20_incremental_span_dedup(spark, str(tmp_path)).collect()
    }
    assert set(out) == {1, 3, 5}  # batch side only
    assert out[1]["tokens_removed"] == SPAN_TOKENS  # corpus-wins
    assert out[3]["tokens_removed"] == 0  # first batch copy kept
    assert out[5]["tokens_removed"] == SPAN_TOKENS  # batch self-dedup


def test_d17_within_doc_repeat_keeps_first(spark, tmp_path):
    # one doc repeats its own W-run: the earlier offset wins, the
    # later occurrence is removed from the SAME document.
    run = [f"r{i}" for i in range(SPAN_TOKENS)]
    rows = [(0, " ".join(run + _tokens("m", 10) + run))]
    spark.createDataFrame(rows, "doc_id bigint, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    row = d17_span_dedup_action(spark, str(tmp_path)).collect()[0]
    assert row["n_removed_occurrences"] == 1
    assert row["tokens_removed"] == SPAN_TOKENS
    assert row["tokens_kept"] == row["n_tokens"] - SPAN_TOKENS
