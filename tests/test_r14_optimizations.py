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


@pytest.mark.parametrize("seed", [13, 89])
def test_e03_gaps_islands_equals_native_session_window(
    spark, tmp_path, seed
):
    """e03's r14 shape (lag + cumulative-sum islands) must reproduce
    the native session_window aggregation row-for-row on random
    timestamps — including events landing EXACTLY gap minutes apart
    (session_window's merge rule is gap <= duration, i.e. the exact-
    gap event stays in the same session) and same-timestamp ties."""
    import datetime as dt

    from pyspark.sql import functions as F

    from rfb_data_pipeline_spark.operators.events import e03_sessionize

    rng = random.Random(seed)
    base = dt.datetime(2024, 5, 1)
    rows = []
    eid = 0
    for user in range(25):
        ts = base + dt.timedelta(seconds=rng.randrange(86400))
        for _ in range(rng.randrange(1, 30)):
            kind = rng.randrange(6)
            if kind == 0:
                step = 300  # exactly the 5-minute gap: must MERGE
            elif kind == 1:
                step = 301  # one second over: must SPLIT
            elif kind == 2:
                step = 0  # same-timestamp tie
            else:
                step = rng.randrange(0, 1200)
            ts = ts + dt.timedelta(seconds=step)
            rows.append((eid, ts, user, "view", 1.0, None))
            eid += 1
    d = tmp_path / f"e03r{seed}"
    d.mkdir()
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp_ntz, user_id bigint, "
        "event_type string, value double, props string",
    ).write.parquet(str(d / "events.parquet"))

    ev = spark.read.parquet(str(d / "events.parquet"))
    native = (
        ev.groupBy("user_id", F.session_window("ts", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.max("ts").alias("last_ts"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "last_ts",
        )
    )
    got = sorted(map(tuple, e03_sessionize(spark, str(d)).collect()))
    want = sorted(map(tuple, native.collect()))
    assert got == want


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
