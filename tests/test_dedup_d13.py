"""Intent tests for d13 (cross-document duplicated-span detection).

The oracle-parity gate proves Spark == DuckDB on the shipped corpus,
but both engines could share a blind spot.  These fixtures pin the
operator's actual guarantee: a duplicated run of >= SPAN_TOKENS tokens
is detected even when the copies sit at DIFFERENT offsets in their
documents (the case any stride > 1 scheme misses), and a run of
SPAN_TOKENS - 1 tokens is not reported.
"""

from __future__ import annotations

import pytest

from rfb_data_pipeline_spark.operators.dedup import SPAN_TOKENS, d13_duplicate_spans


def _tokens(prefix: str, n: int) -> list[str]:
    # globally unique filler tokens: no accidental shared span
    return [f"{prefix}{i}" for i in range(n)]


@pytest.fixture(scope="module")
def d13_dir(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("d13")
    shared = [f"dup{i}" for i in range(SPAN_TOKENS)]  # exactly W tokens
    short = [f"sub{i}" for i in range(SPAN_TOKENS - 1)]  # W-1 tokens
    rows = [
        # shared W-run at offset 3 of doc 0 and offset 11 of doc 1:
        # misaligned stride-2+ windows would never line up, stride 1 must.
        (0, " ".join(_tokens("a", 3) + shared + _tokens("b", 9))),
        (1, " ".join(_tokens("c", 11) + shared + _tokens("d", 7))),
        # W-1 shared run between docs 2 and 3: below threshold, no span.
        (2, " ".join(_tokens("e", 6) + short + _tokens("f", 8))),
        (3, " ".join(_tokens("g", 9) + short + _tokens("h", 6))),
        # unrelated doc
        (4, " ".join(_tokens("i", 40))),
    ]
    spark.createDataFrame(rows, "doc_id bigint, text string").write.parquet(
        str(tmp / "documents.parquet")
    )
    return str(tmp)


def test_d13_detects_misaligned_span_and_respects_threshold(spark, d13_dir):
    row = d13_duplicate_spans(spark, d13_dir).collect()[0]
    # exactly one W-token window of the shared run exists in each doc
    # (the run is exactly W long), so: 1 dup span, 2 occurrences,
    # 2 docs affected, and the W-1 run contributes nothing.
    assert row["n_dup_spans"] == 1
    assert row["n_span_occurrences"] == 2
    assert row["max_docs_per_span"] == 2
    assert row["n_docs_affected"] == 2


def test_d13_longer_run_yields_every_alignment(spark, tmp_path):
    # a shared run of W + 2 tokens contains exactly 3 distinct W-windows,
    # each duplicated across both docs
    shared = [f"x{i}" for i in range(SPAN_TOKENS + 2)]
    rows = [
        (0, " ".join(_tokens("p", 2) + shared + _tokens("q", 2))),
        (1, " ".join(_tokens("r", 5) + shared)),
    ]
    spark.createDataFrame(rows, "doc_id bigint, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    row = d13_duplicate_spans(spark, str(tmp_path)).collect()[0]
    assert row["n_dup_spans"] == 3
    assert row["n_span_occurrences"] == 6
    assert row["n_docs_affected"] == 2
