"""Equivalence pins for the round-14 optimization rewrites (the r13
discipline: every rewrite gets a test that pins the new shape to the
old semantics on data the fixtures don't cover).

d10: the r14 candidate tiers add three exact-by-construction cuts —
doc_a < doc_b on the wide SELF-join (both orientations enumerate the
same gram set), |len_a - len_b| <= 4 on the short tier (implied by
lev <= 4), and xxhash64-folded gram keys (collisions only ADD
candidates; the levenshtein verify discards them) — plus the banded
levenshtein(threshold=4) verify, whose `>= 0` filter selects exactly
the old `lev <= 4` set with identical values. A random corpus with
planted near-dup mutations must therefore match the brute-force truth
exactly.
"""

from __future__ import annotations

import itertools
import random
import string

import pytest

from rfb_data_pipeline_spark.operators.dedup import (
    _D10_MAXLEV,
    _D10_MINLEN,
    _D10_PREFIX,
    d10_fuzzy_pairs,
)


def _lev(x: str, y: str) -> int:
    prev = list(range(len(y) + 1))
    for i, cx in enumerate(x, 1):
        cur = [i]
        for j, cy in enumerate(y, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (cx != cy)))
        prev = cur
    return prev[-1]


def _mutate(rng: random.Random, s: str, k: int) -> str:
    chars = list(s)
    for _ in range(k):
        op = rng.randrange(3)
        p = rng.randrange(len(chars))
        if op == 0:
            chars[p] = rng.choice(string.ascii_lowercase)
        elif op == 1 and len(chars) > _D10_MINLEN:
            del chars[p]
        else:
            chars.insert(p, rng.choice(string.ascii_lowercase))
    return "".join(chars)


@pytest.mark.parametrize("seed", [7, 101])
def test_d10_random_corpus_matches_bruteforce(spark, tmp_path, seed):
    rng = random.Random(seed)
    rows = []
    doc_id = 0
    for _ in range(40):
        n = rng.randint(_D10_MINLEN, 90)  # mixes short-tier and full-tier
        base = "".join(rng.choice(string.ascii_lowercase + "  ") for _ in range(n))
        rows.append((doc_id, base))
        doc_id += 1
        if rng.random() < 0.5:  # planted near-dup with 1..6 edits
            rows.append((doc_id, _mutate(rng, base, rng.randint(1, 6))))
            doc_id += 1
    d = tmp_path / f"d10r{seed}"
    d.mkdir()
    spark.createDataFrame(rows, "doc_id bigint, text string").write.parquet(
        str(d / "documents.parquet")
    )
    docs = {
        i: t[:_D10_PREFIX].lower()
        for i, t in rows
        if len(t) >= _D10_MINLEN
    }
    truth = {
        (i, j, _lev(docs[i], docs[j]))
        for i, j in itertools.combinations(sorted(docs), 2)
        if _lev(docs[i], docs[j]) <= _D10_MAXLEV
    }
    got = {
        (r.doc_a, r.doc_b, r.lev)
        for r in d10_fuzzy_pairs(spark, str(d)).collect()
    }
    assert got == truth
