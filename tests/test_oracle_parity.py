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


# The bespoke q24/q33 sketch-accuracy tests retired in r08: both
# queries now emit verdict columns (exact long values + within-band
# bool + error bucket), so the parametrized oracle test above
# hash-checks them like any other query, and
# tests/test_bounds_oracle.py independently recomputes the exact side
# in pandas and proves the verdict flips out-of-tolerance.


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["n_name", "revenue", "n_orders"]
