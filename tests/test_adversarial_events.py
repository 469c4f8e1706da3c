"""Differential Spark-vs-DuckDB checks on an ADVERSARIAL events table.

The shipped corpus has zero (user_id, ts) ties (verified: 1000/1000
distinct), so ordered-window tie behavior, duplicate event ids, NULL
values, malformed JSON props, and boundary-exact gaps/windows are
never exercised by the oracle gate. These fixtures force every one of
those corners through the full e-family.
"""

from __future__ import annotations

import datetime as dt
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod
from tools.check_oracle import _normalize, value_hash

_QUERIES = entry_mod.queries()
_ORACLES = entry_mod.oracle_sql()

# e01-e15 + e17 (e16 is the corpus-funnel replay over documents — it
# has no events surface to probe here)
_E_PROBED = [f"e{i:02d}" for i in range(1, 16)] + [
    "e17", "e20", "e21", "e22", "e23",
    "g01", "g02", "g03", "g04", "g05", "g06", "g07",
]


def _t(h, m=0, s=0, us=0):
    return dt.datetime(2024, 3, 10, h, m, s, us)


_ROWS = [
    # user 1: a VIEW precedes the tied clicks so e17's matched-click
    # tie collapse and step2/step3 paths are exercised non-vacuously
    # (third review pass, finding 2)
    (99, _t(0, 50), 1, "view", 1.0, '{"k": 0}'),
    # user 1: EXACT-TIE timestamps (two clicks, distinct event ids),
    # then a third click; signup → purchase at EXACTLY +24h (the e12
    # within-24h boundary)
    (100, _t(1, 0), 1, "click", 10.0, '{"k": 1}'),
    (101, _t(1, 0), 1, "click", 20.0, '{"k": 2}'),
    (102, _t(1, 10), 1, "click", 30.0, '{"k": 3}'),
    (103, _t(2, 0), 1, "signup", 1.0, '{"k": 4}'),
    (104, dt.datetime(2024, 3, 11, 2, 0), 1, "purchase", 99.0, '{"k": 5}'),
    # user 2: DUPLICATE event_id (same id, same ts — a real re-delivery),
    # a NULL value, malformed + empty props
    (200, _t(3, 0), 2, "view", 5.0, '{"k": 6}'),
    (200, _t(3, 0), 2, "view", 5.0, '{"k": 6}'),
    (201, _t(3, 5), 2, "view", None, "{bad json"),
    (202, _t(3, 6), 2, "view", 7.5, None),
    (203, _t(3, 7), 2, "error", 0.005, ""),
    # user 3: hour-boundary-exact timestamps (window edges) and a
    # session gap of exactly 30 minutes (the e03 threshold)
    (300, _t(4, 0), 3, "click", 1.0, '{"k": 7}'),
    (301, _t(4, 30), 3, "click", 2.0, '{"k": 8}'),
    (302, _t(5, 0), 3, "click", 3.0, '{"k": 9}'),
    (303, _t(6, 0, 0), 3, "signup", 4.0, '{"k": 10}'),
    (304, _t(6, 0, 0), 3, "purchase", 5.0, '{"k": 11}'),  # same-ts pair
    # a lone user whose only event has a value that rounds on the
    # half-cent boundary (e15's integer-cents discipline)
    (400, _t(7, 0), 4, "view", 1.005, '{"k": 12}'),
    (401, _t(9, 0), 4, "view", 2.675, '{"k": 13}'),
]


@pytest.fixture(scope="module")
def adv_events_dir(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("adv_events")
    df = spark.createDataFrame(
        _ROWS,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    )
    df.coalesce(1).write.parquet(str(tmp / "events.parquet"))
    return str(tmp)


@pytest.fixture(scope="module")
def adv_events_duck(adv_events_dir):
    con = duckdb.connect()
    p = os.path.join(adv_events_dir, "events.parquet")
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize("prefix", _E_PROBED)
def test_adversarial_events_parity(spark, adv_events_dir, adv_events_duck, prefix):
    name = next(n for n in _QUERIES if n.startswith(prefix))
    spdf = _QUERIES[name](spark, adv_events_dir).toPandas()
    opdf = adv_events_duck.execute(_ORACLES[name]).fetchdf()
    assert sorted(spdf.columns) == sorted(opdf.columns)
    assert len(spdf) == len(opdf), (name, len(spdf), len(opdf))
    sn, on = _normalize(spdf), _normalize(opdf)
    if value_hash(sn) != value_hash(on):
        diff = next((a, b) for a, b in zip(sn, on) if a != b)
        raise AssertionError(
            f"{name}: value mismatch, first diff spark={diff[0]} "
            f"duckdb={diff[1]}"
        )


def test_e22_diverges_from_e17_on_second_click_conversion(spark, tmp_path):
    """e22's whole reason to exist: a view whose FIRST in-window click
    never converts but whose SECOND in-window click does must count in
    e22 (any-click) and NOT in e17 (first-click). Stock data happens
    to produce identical totals for both, so this synthetic fixture is
    the only evidence the skip semantics are real."""
    from rfb_data_pipeline_spark.operators.events import (
        e17_multistep_funnel,
        e22_any_click_funnel,
    )

    t0 = dt.datetime(2024, 4, 1, 12, 0)

    def mins(m):
        return t0 + dt.timedelta(minutes=m)

    rows = [
        # view at t0; click1 at +10m; click2 at +50m (still in the 1h
        # window); the ONLY purchase lands at +24h30m — beyond
        # click1's 24h deadline (+24h10m), inside click2's (+24h50m)
        (1, mins(0), 1, "view", 1.0, None),
        (2, mins(10), 1, "click", 1.0, None),
        (3, mins(50), 1, "click", 1.0, None),
        (4, mins(24 * 60 + 30), 1, "purchase", 9.0, None),
    ]
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(str(tmp_path / "events.parquet"))
    first = e17_multistep_funnel(spark, str(tmp_path)).first()
    any_ = e22_any_click_funnel(spark, str(tmp_path)).first()
    assert first["n_views"] == any_["n_views"] == 1
    assert first["n_clicked_1h"] == any_["n_clicked_1h"] == 1
    assert first["n_purchased_24h"] == 0  # first-click rule: no match
    assert any_["n_purchased_any"] == 1  # any-click rule: click2 wins
