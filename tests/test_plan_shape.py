"""Plan-shape regression tests: the scale contract as assertions.

These pin the physical properties that make the engine viable at
100 TB — if a refactor drops a pushdown, un-broadcasts a dimension,
or sneaks a Python eval into the hot path, these fail even though
results stay correct.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from rfb_data_pipeline_spark.plans import inspect as pi
from tests.conftest import SF_SMALL

_QUERIES = entry_mod.queries()


def _q(spark, name):
    return _QUERIES[name](spark, SF_SMALL)


def test_q01_filter_pushed_and_pruned(spark):
    df = _q(spark, "q01_pricing_summary")
    pushed = " ".join(pi.pushed_filters(df))
    assert "l_shipdate" in pushed  # predicate reached the parquet scan
    schemas = " ".join(pi.read_schemas(df))
    assert "l_comment" not in schemas
    # only needed columns read
    assert "l_partkey" not in schemas and "l_suppkey" not in schemas


def test_q03_topk_no_global_sort(spark):
    df = _q(spark, "q03_topk_revenue")
    assert pi.uses_take_ordered(df)  # limit+orderBy → TakeOrdered
    pushed = " ".join(pi.pushed_filters(df))
    assert "c_mktsegment" in pushed and "o_orderdate" in pushed


def test_q05_dimensions_broadcast(spark):
    df = _q(spark, "q05_region_revenue")
    assert pi.uses_broadcast_join(df)
    # region filter is pushed into its scan, before the join
    assert any("r_name" in p for p in pi.pushed_filters(df))


def test_q06_single_codegen_scan(spark):
    df = _q(spark, "q06_forecast_revenue")
    pushed = " ".join(pi.pushed_filters(df))
    assert "l_shipdate" in pushed and "l_discount" in pushed
    # scan reads only the 4 referenced columns
    schemas = pi.read_schemas(df)
    assert len(schemas) == 1
    assert schemas[0].count(":") == 4


def test_no_python_eval_in_query_surface(spark):
    """No row-at-a-time Python anywhere in the declared queries."""
    for name in sorted(_QUERIES):
        assert not pi.has_python_eval(_QUERIES[name](spark, SF_SMALL)), name


def test_q09_single_shuffle_window(spark):
    # top-k per group: one shuffle for the join + one for the window,
    # nothing quadratic
    df = _q(spark, "q09_topk_per_group")
    assert pi.n_exchanges(df) <= 3


def test_s01_query_vector_broadcast(spark):
    df = _q(spark, "s01_knn_bruteforce")
    assert pi.uses_broadcast_join(df) or "BroadcastNestedLoopJoin" in (
        pi.explain_string(df, "simple")
    )
    assert pi.uses_take_ordered(df)
