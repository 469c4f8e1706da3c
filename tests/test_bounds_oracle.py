"""The q24/q33 bounds tier: approximate sketches stay rows-only for
the driver, but locally each estimate must land within a pinned
tolerance of DuckDB's exact value — and the checker itself must
actually reject out-of-bounds frames (a gate that can't fail is no
gate)."""

from __future__ import annotations

import os

import duckdb
import pandas as pd

from tests.conftest import SF_SMALL
from tools.check_oracle import check_bounds


def _con(sf_dir):
    con = duckdb.connect()
    p = os.path.join(sf_dir, "lineitem.parquet")
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{p}')")
    return con


def test_sketches_within_bounds(spark):
    import __spark_entry__ as e

    bounds = e.bounds_oracle()
    assert set(bounds) == {"q24_approx_distinct", "q33_approx_quantiles"}
    qs = e.queries()
    con = _con(SF_SMALL)
    for name, spec in bounds.items():
        spdf = qs[name](spark, SF_SMALL).toPandas()
        assert check_bounds(con, spdf, spec) == [], name


def test_checker_rejects_out_of_bounds():
    from rfb_data_pipeline_spark.operators.relational import BOUNDS

    con = _con(SF_SMALL)
    spec = BOUNDS["q24_approx_distinct"]
    exact = con.execute(spec["sql"]).fetchdf()
    # 10% inflation breaks the 5% band; a wrong n_rows breaks exact
    off = exact.assign(approx_orders=(exact["approx_orders"] * 1.1))
    assert any("approx_orders" in p for p in check_bounds(con, off, spec))
    off2 = exact.assign(n_rows=exact["n_rows"] + 1)
    assert any("n_rows" in p for p in check_bounds(con, off2, spec))
    # a vacuously truncated frame (the limit(32) failure mode) is a
    # rowcount FAIL, not a pass
    assert any(
        "rowcount" in p for p in check_bounds(con, exact.head(1), spec)
    )
