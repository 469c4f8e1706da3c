"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose the full operator surface (SURVEY.md §2.2) with
DuckDB oracles. Column aliases match between both sides.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

SF0_001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Star-schema revenue query: filter → broadcast dim joins → hash agg →
    top-k (the q05/q03 shape from SURVEY.md §7 step 1).
    """
    from rfb_data_pipeline_spark.operators.relational import q04_revenue_by_nation

    return q04_revenue_by_nation(spark, SF0_001)


def _registry() -> tuple[dict, dict]:
    from rfb_data_pipeline_spark.operators import (
        dedup,
        events,
        graph,
        integrity,
        media,
        pipeline_e2e,
        relational,
        sampling,
        similarity,
        text,
    )

    from rfb_data_pipeline_spark import rotation

    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracle: dict[str, str] = {}
    for mod in (
        relational, events, dedup, text, similarity, sampling, media, graph,
        integrity, pipeline_e2e,
    ):
        queries.update(mod.QUERIES)
        oracle.update(mod.ORACLE)
    # Registry ORDER matters: the driver's correctness harness records
    # only the first 50 entries per round, so the window IS the audit
    # schedule. Since r06 the order is computed from the rotation
    # ledger (rfb_data_pipeline_spark/rotation.py, VERDICT r05 item 2):
    # never-driver-checked first, then touched-since-their-row, then
    # green oldest-first (rows-only last within a round). Maintain the
    # ledger — LAST_DRIVER_ROW when a CORRECTNESS file lands,
    # LAST_TOUCHED when a round changes a query's code or oracle,
    # CURRENT_ROUND each round — and the schedule takes care of
    # itself; tests/test_registry_window.py pins the resulting window
    # and the freshness invariant (no entry older than one 3-round
    # cycle).
    order = rotation.window_order(list(queries), set(oracle))
    assert len(order) == len(queries) and set(order) == set(queries), (
        sorted(set(queries) - set(order)),
        sorted(set(order) - set(queries)),
    )
    rotation.assert_ledger_invariants(list(queries), set(oracle))
    queries = {n: queries[n] for n in order}
    oracle = {n: oracle[n] for n in order if n in oracle}
    return queries, oracle


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _registry()[0]


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle for each SQL-expressible query."""
    return _registry()[1]


def bounds_oracle() -> dict[str, dict]:
    """Empty since r08: q24/q33 now emit hash-checkable verdict
    columns (exact value + within-tolerance bool + error bucket), so
    the sketch-tolerance check runs through the driver's value hash
    instead of this local-only tier. Hook kept for check_oracle.py."""
    from rfb_data_pipeline_spark.operators import relational

    return dict(relational.BOUNDS)
