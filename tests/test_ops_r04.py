"""Intent tests for the round-4 operators (d14, t12, x11, s11).

The oracle-parity gate proves Spark == DuckDB on the shipped corpus;
these fixtures pin each operator's actual guarantee on constructed
inputs where the right answer is known independently.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from rfb_data_pipeline_spark.operators.dedup import (
    SPAN_TOKENS,
    d14_dup_span_fraction,
)
from rfb_data_pipeline_spark.operators.sampling import (
    CURRICULUM_BUCKETS,
    x11_curriculum_buckets,
)
from rfb_data_pipeline_spark.operators.similarity import (
    BATCH_QUERY_IDS,
    TOP_K,
    s01_knn_bruteforce,
    s11_batch_knn,
)
from rfb_data_pipeline_spark.operators.text import ZIPF_TERMS, t12_zipf_slope
from tests.conftest import SF_SMALL


def _tokens(prefix: str, n: int) -> list[str]:
    return [f"{prefix}{i}" for i in range(n)]


# --------------------------------------------------------------------------
# d14 — per-doc duplicated-span fraction


@pytest.fixture(scope="module")
def d14_dir(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("d14")
    shared = [f"dup{i}" for i in range(SPAN_TOKENS)]  # exactly W tokens
    rows = [
        # docs 0/1 share one W-run at different offsets → exactly one
        # duplicated window position each
        (0, " ".join(_tokens("a", 3) + shared + _tokens("b", 9))),
        (1, " ".join(_tokens("c", 11) + shared + _tokens("d", 7))),
        # doc 2: fully unique, fraction must be 0.0
        (2, " ".join(_tokens("u", 40))),
        # doc 3: exact copy of doc 2 → EVERY span duplicated, fraction 1.0
        (3, " ".join(_tokens("u", 40))),
    ]
    spark.createDataFrame(rows, "doc_id bigint, text string").write.parquet(
        str(tmp / "documents.parquet")
    )
    return str(tmp)


def test_d14_fractions(spark, d14_dir):
    rows = {r.doc_id: r for r in d14_dup_span_fraction(spark, d14_dir).collect()}
    # doc 0: 28 tokens → 13 spans, exactly 1 (the shared window) duplicated
    assert rows[0].n_spans == 13
    assert rows[0].n_dup_spans == 1
    assert rows[0].dup_frac == round(1 / 13, 4)
    assert rows[1].n_dup_spans == 1
    # exact copies: every span position duplicated in both docs
    assert rows[2].n_spans == 40 - SPAN_TOKENS + 1
    assert rows[2].dup_frac == 1.0
    assert rows[3].dup_frac == 1.0


def test_d14_consistent_with_sf_corpus(spark):
    """On the shipped corpus the per-doc fractions must aggregate to
    d13's corpus-level numbers (same span table, two granularities)."""
    from rfb_data_pipeline_spark.operators.dedup import d13_duplicate_spans

    per_doc = d14_dup_span_fraction(spark, SF_SMALL).collect()
    summary = d13_duplicate_spans(spark, SF_SMALL).collect()[0]
    assert sum(r.n_dup_spans for r in per_doc) == summary.n_span_occurrences
    assert sum(1 for r in per_doc if r.n_dup_spans > 0) == summary.n_docs_affected


# --------------------------------------------------------------------------
# t12 — Zipf slope


def test_t12_exact_power_law(spark, tmp_path):
    """A corpus whose term frequencies are exactly freq(r) = 2^(12-r)
    must fit slope = -12/log2... — i.e. ln(freq) = ln(2^12) + r*ln(1/2),
    but regressed on ln(rank), not rank. Instead use freq(r) = C/r
    (the pure Zipf law): slope must come out -1 and R² = 1."""
    n_terms = 12
    c = 720720  # divisible by 1..13 → exact integer frequencies
    rows = []
    doc = []
    for r in range(1, n_terms + 1):
        doc.extend([f"term{r:02d}"] * (c // r))
    # single long document carrying the exact distribution
    rows.append((0, " ".join(doc)))
    spark.createDataFrame(rows, "doc_id bigint, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    got = t12_zipf_slope(spark, str(tmp_path)).collect()[0]
    assert got.n_terms == n_terms  # fewer distinct terms than ZIPF_TERMS
    assert got.zipf_slope == -1.0
    assert got.r_squared == 1.0


def test_t12_matches_numpy_on_corpus(spark, duck):
    """Slope on the shipped corpus equals an independent numpy OLS fit
    of the same top-N head."""
    head = duck.execute(
        f"""
        SELECT count(*) AS freq
        FROM (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS term
              FROM documents)
        WHERE length(term) > 0
        GROUP BY term ORDER BY freq DESC, term LIMIT {ZIPF_TERMS}
        """
    ).fetchall()
    y = np.log([f for (f,) in head])
    x = np.log(np.arange(1, len(head) + 1, dtype=float))
    slope, intercept = np.polyfit(x, y, 1)
    got = t12_zipf_slope(spark, SF_SMALL).collect()[0]
    assert got.n_terms == len(head)
    assert math.isclose(got.zipf_slope, slope, abs_tol=2e-4)
    assert math.isclose(got.zipf_intercept, intercept, abs_tol=2e-4)


# --------------------------------------------------------------------------
# x11 — curriculum quality buckets


def test_x11_equal_depth_and_monotone(spark):
    rows = sorted(
        x11_curriculum_buckets(spark, SF_SMALL).collect(), key=lambda r: r.bucket
    )
    assert [r.bucket for r in rows] == list(range(1, CURRICULUM_BUCKETS + 1))
    n = sum(r.n_docs for r in rows)
    q, rem = divmod(n, CURRICULUM_BUCKETS)
    # ntile semantics: first `rem` buckets get q+1 docs, the rest q
    assert [r.n_docs for r in rows] == [
        q + 1 if b <= rem else q for b in range(1, CURRICULUM_BUCKETS + 1)
    ]
    # bucket 1 holds the best docs: per-bucket score ranges must be
    # non-overlapping and descending
    for hi, lo in zip(rows, rows[1:]):
        assert hi.min_score >= lo.max_score
        assert hi.avg_score >= lo.avg_score


# --------------------------------------------------------------------------
# s11 — batched kNN


def test_s11_shape_and_brute_force_parity(spark):
    out = s11_batch_knn(spark, SF_SMALL).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.qid, []).append(r)
    assert sorted(by_q) == sorted(BATCH_QUERY_IDS)
    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").collect()
    }
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, TOP_K + 1))
        cosines = [r.cosine for r in rows]
        assert cosines == sorted(cosines, reverse=True)
        # independent numpy check of the winner set
        q = emb[qid]
        scored = {
            vid: float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q)))
            for vid, v in emb.items()
            if vid not in BATCH_QUERY_IDS
        }
        want = sorted(
            scored, key=lambda vid: (-round(scored[vid], 4), vid)
        )[:TOP_K]
        assert [r.vec_id for r in rows] == want


def test_s11_qid_agrees_with_s01_modulo_candidate_set(spark):
    """For the shared query vector (vec 0), s11 and s01 agree on every
    neighbor that is in both candidate sets (s01 only excludes vec 0;
    s11 excludes the whole batch)."""
    s01 = {r.vec_id: r.cosine for r in s01_knn_bruteforce(spark, SF_SMALL).collect()}
    s11 = {
        r.vec_id: r.cosine
        for r in s11_batch_knn(spark, SF_SMALL).collect()
        if r.qid == 0
    }
    for vid in set(s01) & set(s11):
        assert s01[vid] == s11[vid]
