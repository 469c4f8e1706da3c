"""Differential tests: every declared query vs its DuckDB oracle at
sf0.001 (fast); the driver runs the same comparison at sf0.01.

Both sides go through pandas (``toPandas`` / ``fetchdf``) and the
dtype-sensitive canon from tools.check_oracle — the round-1 lesson is
that ``fetchall`` returns Python ints where the driver's pandas path
sees float64 (DuckDB HUGEINT), so anything else masks driver-reds.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_SMALL
from tools.check_oracle import _normalize, value_hash

_QUERIES = entry_mod.queries()
_ORACLES = entry_mod.oracle_sql()


def test_registry_shape():
    assert _QUERIES, "queries() must not be empty"
    # every oracle key must have a query implementation
    assert set(_ORACLES) <= set(_QUERIES)


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(spark, duck, name):
    sdf = _QUERIES[name](spark, SF_SMALL)
    spdf = sdf.toPandas()
    if name not in _ORACLES:
        # still enforce driver-canon hashability (arrays crash it)
        _normalize(spdf)
        pytest.skip("rows-only query (no SQL oracle)")
    opdf = duck.execute(_ORACLES[name]).fetchdf()
    assert sorted(spdf.columns) == sorted(opdf.columns)
    assert len(spdf) == len(opdf)
    sn, on = _normalize(spdf), _normalize(opdf)
    if value_hash(sn) != value_hash(on):
        diff = next((a, b) for a, b in zip(sn, on) if a != b)
        raise AssertionError(f"value mismatch, first diff spark={diff[0]} duckdb={diff[1]}")


def test_approx_distinct_accuracy(spark, duck):
    """q24 has no SQL oracle (HLL is engine-specific); assert the
    estimate lands within 5% of DuckDB's exact distinct count."""
    got = {
        r.l_returnflag: r.approx_orders
        for r in _QUERIES["q24_approx_distinct"](spark, SF_SMALL).collect()
    }
    exact = dict(
        duck.execute(
            "SELECT l_returnflag, count(DISTINCT l_orderkey) "
            "FROM lineitem GROUP BY 1"
        ).fetchall()
    )
    assert set(got) == set(exact)
    for flag, est in got.items():
        assert abs(est - exact[flag]) / exact[flag] < 0.05


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["n_name", "revenue", "n_orders"]


def test_approx_quantiles_accuracy(spark, duck):
    """q33 has no SQL oracle (quantile sketches are engine-specific);
    assert each estimated percentile lands within 1% relative error of
    DuckDB's exact quantile_cont."""
    rows = {
        r.l_returnflag: r
        for r in _QUERIES["q33_approx_quantiles"](spark, SF_SMALL).collect()
    }
    exact = {
        flag: (p25, p50, p75, p99)
        for flag, p25, p50, p75, p99 in duck.execute(
            "SELECT l_returnflag,"
            " quantile_cont(l_extendedprice, 0.25),"
            " quantile_cont(l_extendedprice, 0.50),"
            " quantile_cont(l_extendedprice, 0.75),"
            " quantile_cont(l_extendedprice, 0.99)"
            " FROM lineitem GROUP BY 1"
        ).fetchall()
    }
    assert set(rows) == set(exact)
    for flag, r in rows.items():
        for est, ex in zip((r.p25, r.p50, r.p75, r.p99), exact[flag]):
            assert abs(est - ex) / abs(ex) < 0.01, (flag, est, ex)
