"""Seeded random-events differential probe: e01–e15 + e17 compared
Spark-vs-DuckDB over event tables a fixed PRNG generates — the
test_fuzz_corpus.py idea applied to the time axis, where the
engine-divergence surface is different: window/bucket boundary
landing, exact-timestamp ties, duplicate re-deliveries, NULL values,
malformed JSON props, half-cent rounding, and out-of-order arrival.

The generator deliberately mass-places timestamps ON the boundaries
the operators bucket by (exact hour, exact half-hour, exact 5-minute
session gaps) because that is where a `<` vs `<=` disagreement
between the Spark expression and its SQL twin would hide. Seeds are
FIXED so failures reproduce."""

from __future__ import annotations

import datetime as dt
import os
import random

import duckdb
import pytest

from tests.test_degenerate_corpus import _ORACLES, _QUERIES
from tools.check_oracle import _normalize, value_hash

_E_PROBED = [f"e{i:02d}" for i in range(1, 16)] + [
    "e17", "e20", "e21", "e22", "e23",
    "g01", "g02", "g03", "g04", "g05", "g06", "g07",
]

_BASE = dt.datetime(2024, 3, 10, 0, 0, 0)
_TYPES = ["view", "view", "view", "click", "click", "signup", "purchase", "error"]


def _make_events(seed: int, n: int = 220) -> list[tuple]:
    rng = random.Random(seed)
    rows: list[tuple] = []
    last_ts_per_user: dict[int, dt.datetime] = {}
    event_id = 100
    for _ in range(n):
        event_id += rng.randint(1, 2)  # occasional id gaps
        user = rng.randint(1, 8)
        r = rng.random()
        if r < 0.12 and user in last_ts_per_user:
            ts = last_ts_per_user[user]  # EXACT tie with an earlier event
        elif r < 0.27:
            # land exactly on an hour / half-hour bucket boundary
            ts = _BASE + dt.timedelta(
                hours=rng.randint(0, 47), minutes=rng.choice([0, 30])
            )
        elif r < 0.37 and user in last_ts_per_user:
            # land exactly at prev + 5 minutes (the e03 session-gap edge)
            ts = last_ts_per_user[user] + dt.timedelta(minutes=5)
        else:
            ts = _BASE + dt.timedelta(
                hours=rng.randint(0, 47),
                minutes=rng.randint(0, 59),
                seconds=rng.randint(0, 59),
            )
        last_ts_per_user[user] = ts
        etype = rng.choice(_TYPES)
        vr = rng.random()
        if vr < 0.06:
            value = None
        elif vr < 0.18:
            value = rng.randint(0, 99) + rng.choice([0.005, 0.015, 0.675])
        else:
            value = round(rng.random() * 100, 3)
        pr = rng.random()
        if pr < 0.05:
            props = None
        elif pr < 0.1:
            props = "{bad json"
        elif pr < 0.13:
            props = ""
        else:
            props = '{"k": %d, "step": "%s"}' % (event_id % 37, etype)
        rows.append((event_id, ts, user, etype, value, props))
        if rng.random() < 0.05:
            rows.append(rows[-1])  # verbatim re-delivery (dup event_id)
    rng.shuffle(rows)  # out-of-order arrival
    return rows


@pytest.fixture(scope="module", params=[23, 71])
def fuzz_events_env(request, spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp(f"fuzzev{request.param}")
    spark.createDataFrame(
        _make_events(request.param),
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(str(tmp / "events.parquet"))
    con = duckdb.connect()
    p = os.path.join(str(tmp), "events.parquet")
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    yield str(tmp), con
    con.close()


@pytest.mark.parametrize("prefix", _E_PROBED)
def test_fuzz_events_parity(spark, fuzz_events_env, prefix):
    fuzz_dir, con = fuzz_events_env
    name = next(n for n in _QUERIES if n.startswith(prefix))
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


def test_fuzz_events_is_nonvacuous(spark, fuzz_events_env):
    """The generated stream must hit the interesting paths: exact-tie
    timestamps, duplicate event ids, NULL values, and boundary-landing
    rows — otherwise the parity above proves less than it claims."""
    fuzz_dir, _ = fuzz_events_env
    rows = spark.read.parquet(fuzz_dir + "/events.parquet").collect()
    key = lambda r: (r["user_id"], r["ts"])  # noqa: E731
    ks = [key(r) for r in rows]
    assert len(ks) != len(set(ks)), "no exact-tie timestamps generated"
    ids = [r["event_id"] for r in rows]
    assert len(ids) != len(set(ids)), "no duplicate event_id generated"
    assert any(r["value"] is None for r in rows)
    assert any(
        r["ts"].minute in (0, 30) and r["ts"].second == 0 for r in rows
    ), "no boundary-landing timestamps"
