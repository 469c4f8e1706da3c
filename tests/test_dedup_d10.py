"""Adversarial recall tests for d10 (bounded edit-distance fuzzy pairs).

The sf* corpus's near-dup pairs happen to have clustered edits, so the
oracle-parity gate alone cannot distinguish a sound candidate width
from an unsound one.  These fixtures place the edits to DEFEAT any
gram wider than the pigeonhole bound (PREFIX - MAXLEV) / (MAXLEV + 1)
= 12: four substitutions spread evenly across the 64-char prefix leave
no preserved run longer than 14 chars, so a (say) 44-gram key would
yield zero candidates and silently drop the pair.
"""

from __future__ import annotations

import string

import pytest

from rfb_data_pipeline_spark.operators.dedup import (
    _D10_MAXLEV,
    _D10_PREFIX,
    d10_fuzzy_pairs,
)

# 64 distinct-ish chars: no repeated 4-gram anywhere, so every shared
# gram between two docs is a genuinely preserved run, and unrelated
# docs share nothing.
_ALPHA = string.ascii_lowercase + string.digits


def _base(seed: int, n: int = 96) -> str:
    # Deterministic low-collision text: rolling mix over the alphabet.
    out = []
    x = seed * 2654435761 % (2**32)
    for _ in range(n):
        x = (x * 1103515245 + 12345) % (2**31)
        out.append(_ALPHA[x % len(_ALPHA)])
    return "".join(out)


def _edit_at(s: str, positions: list[int]) -> str:
    chars = list(s)
    for p in positions:
        chars[p] = "#" if chars[p] != "#" else "@"
    return "".join(chars)


@pytest.fixture()
def d10_dir(spark, tmp_path):
    a = _base(1)
    # 4 substitutions spread evenly across the 64-char prefix:
    # preserved runs are 12..14 chars — exactly the pigeonhole bound.
    spread = _edit_at(a, [12, 25, 38, 51])
    # 5 edits inside the prefix: lev = 5 > MAXLEV, must NOT pair.
    over = _edit_at(a, [5, 15, 25, 35, 45])
    b = _base(2)
    b_clustered = _edit_at(b, [30, 31, 32])  # easy case: one run broken
    # Short tier: 50-char docs (< PREFIX, >= MINLEN) with spread edits.
    s = _base(3, n=50)
    s_spread = _edit_at(s, [10, 20, 30, 40])
    rows = [
        (1, a),
        (2, spread),
        (3, over),
        (4, b),
        (5, b_clustered),
        (6, s),
        (7, s_spread),
        (8, _base(4)),  # unrelated noise
    ]
    spark.createDataFrame(rows, "doc_id bigint, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_d10_spread_edits_recall(spark, d10_dir):
    got = {
        (r.doc_a, r.doc_b, r.lev)
        for r in d10_fuzzy_pairs(spark, d10_dir).collect()
    }
    assert (1, 2, 4) in got, "full-tier pair with pigeonhole-bound runs missed"
    assert (4, 5, 3) in got, "clustered-edit pair missed"
    assert (6, 7, 4) in got, "short-tier (sub-64 prefix) spread pair missed"
    assert all(p[2] <= _D10_MAXLEV for p in got)
    assert not any({p[0], p[1]} == {1, 3} for p in got), "lev=5 pair leaked"


def test_d10_exact_pair_set(spark, d10_dir):
    """The result must equal the brute-force truth over all pairs."""
    import itertools

    def lev(x: str, y: str) -> int:
        prev = list(range(len(y) + 1))
        for i, cx in enumerate(x, 1):
            cur = [i]
            for j, cy in enumerate(y, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (cx != cy))
                )
            prev = cur
        return prev[-1]

    docs = {
        r.doc_id: r.text[:_D10_PREFIX]
        for r in spark.read.parquet(d10_dir + "/documents.parquet").collect()
    }
    truth = {
        (i, j, lev(docs[i], docs[j]))
        for i, j in itertools.combinations(sorted(docs), 2)
        if lev(docs[i], docs[j]) <= _D10_MAXLEV
    }
    got = {
        (r.doc_a, r.doc_b, r.lev)
        for r in d10_fuzzy_pairs(spark, d10_dir).collect()
    }
    assert got == truth
