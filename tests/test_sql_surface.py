"""The engine's SQL surface: the same star schema is queryable via
``spark.sql`` over registered temp views (catalog.load_tables), and
SQL and DataFrame plans produce identical results.
"""

from __future__ import annotations

from rfb_data_pipeline_spark.catalog import load_tables
from rfb_data_pipeline_spark.operators.relational import q05_region_revenue
from tests.conftest import SF_SMALL


def test_views_registered_and_sql_runs(spark):
    tables = load_tables(spark, SF_SMALL)
    assert set(tables) >= {"lineitem", "orders", "customer", "events", "documents"}
    row = spark.sql(
        "SELECT count(*) AS n FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
    ).collect()[0]
    assert row.n > 0


def test_sql_equals_dataframe_result(spark):
    load_tables(spark, SF_SMALL)
    sql_df = spark.sql(
        """
        SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY n_name
        """
    )
    df = q05_region_revenue(spark, SF_SMALL)
    got_sql = sorted((r.n_name, r.revenue) for r in sql_df.collect())
    got_df = sorted((r.n_name, r.revenue) for r in df.collect())
    assert got_sql == got_df
