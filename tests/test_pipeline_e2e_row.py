"""p01_pipeline_month_e2e — the driver row that puts the END-TO-END
RFB lifecycle (discover → download → extract → load → validate →
report) under the DuckDB value hash (VERDICT r09 item 2). These tests
pin the lattice semantics the oracle twin hard-codes as constants, so
a pipeline change that shifts them fails HERE with a named assertion
instead of as an opaque hash mismatch at the driver.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rfb_data_pipeline_spark.operators.pipeline_e2e import (
    p01_pipeline_month_e2e,
)
from tests.conftest import SF_SMALL


def test_p01_summary_semantics(spark):
    row = p01_pipeline_month_e2e(spark, SF_SMALL).first()
    # status lattice: the clean cnaes zip succeeds; the two empresas
    # zips FAIL (their load carries injected v2/v3 violations and
    # LoadResult.passed folds validations in); the unroutable zip is
    # ignorada. Nothing pending: the month completed.
    assert (
        row.files_sucesso,
        row.files_falhou,
        row.files_ignorada,
    ) == (1, 2, 1)
    # both tables loaded and count-reconciled (v1/A7), but only the
    # clean one passes the full validation gate
    assert (row.tables_loaded, row.loads_count_gate_ok, row.loads_passed) == (
        2,
        2,
        1,
    )
    orders = spark.read.parquet(SF_SMALL + "/orders.parquet")
    n = orders.count()
    n31 = orders.where(F.pmod(F.col("o_orderkey"), F.lit(31)) == 0).count()
    assert row.empresas_rows == n + n31
    assert row.cnaes_rows == 25
    # injections are non-vacuous at every SF
    assert row.null_razao_rows > 0
    assert row.bad_cnpj_rows > 0
    assert row.orphan_natureza_rows > 0
    assert row.dup_keys == n31 > 0
    assert row.dup_rows == 2 * n31
    assert row.sum_capital_cents > 0
