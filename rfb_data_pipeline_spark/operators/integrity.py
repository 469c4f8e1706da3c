"""Driver-visible rows for the ingestion-pipeline integrity suite.

Tier-A correctness (the README-promised null/format/referential
validation suite, ``/root/reference/READme.md:27-30``; implemented in
``pipeline/validate.py``) rode entirely on pytest through r06. This
module puts it under the DuckDB oracle too (VERDICT r06 item 5):

The query synthesizes an ``rfb_estabelecimentos``-shaped frame from
``orders`` with violations injected BY CONSTRUCTION (the t13
injected-PII idiom — the effect exists on stock data at every SF, so
the oracle row can never pass vacuously):

- every ``o_orderkey % 97 == 0`` row gets a NULL ``cnpj_ordem``
  (v2 null-essentials must count it);
- every ``% 89 == 0`` row gets a lowercase ``uf`` and every
  ``% 83 == 0`` row a 7-digit ``cep`` (v3 format checks must count
  them, and must NOT count the NULLs);
- ``codigo_municipio = pmod(o_orderkey, 30)`` against the 25-key
  ``nation`` dimension leaves keys 25-29 orphaned (v4 referential
  anti-join must count them).

The Spark side runs the REAL detectors from ``pipeline/validate.py``;
the DuckDB twin recomputes each count from the INJECTION predicates —
detection and injection agree only if the detectors are right.

Scale: the fixture is a map over the ``orders`` scan; v2/v3 are one
scan-side aggregate, v4 one broadcast anti-join against a 25-row dim.
No shuffle grows with the fact side beyond the final 4-row report.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rfb_data_pipeline_spark.catalog import load_tables
from rfb_data_pipeline_spark.pipeline.validate import (
    v2_null_essentials,
    v3_format_checks,
    v4_referential,
)

_FIXTURE_TABLE = "rfb_estabelecimentos"
_UFS = ("SP", "RJ", "MG", "RS", "BA")


def rfb_fixture_from_orders(orders: DataFrame) -> DataFrame:
    """orders → a deterministic estabelecimentos-shaped frame with the
    violation classes above injected (pmod everywhere: the sign-safe
    modulo rule from tests/test_negative_ids.py)."""
    k = F.col("o_orderkey")
    ufs = F.array(*[F.lit(u) for u in _UFS])
    uf = F.element_at(ufs, (F.pmod(k, F.lit(5)) + 1).cast("int"))
    cep8 = F.lpad(F.pmod(k, F.lit(100000000)).cast("string"), 8, "0")
    return orders.select(
        F.lpad(F.pmod(k, F.lit(100000000)).cast("string"), 8, "0").alias(
            "cnpj_basico"
        ),
        F.when(F.pmod(k, F.lit(97)) == 0, F.lit(None).cast("string"))
        .otherwise(F.lpad(F.pmod(k, F.lit(10000)).cast("string"), 4, "0"))
        .alias("cnpj_ordem"),
        F.lpad(F.pmod(k, F.lit(100)).cast("string"), 2, "0").alias("cnpj_dv"),
        F.when(F.pmod(k, F.lit(89)) == 0, F.lower(uf)).otherwise(uf).alias("uf"),
        F.when(
            F.pmod(k, F.lit(83)) == 0,
            F.lpad(F.pmod(k, F.lit(10000000)).cast("string"), 7, "0"),
        )
        .otherwise(cep8)
        .alias("cep"),
        F.pmod(k, F.lit(30)).alias("codigo_municipio"),
    )


def v01_integrity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(check_kind, col_name, n_bad) report of the full v2+v3+v4 suite
    over the injected fixture — one row per violating column/check."""
    tables = load_tables(
        spark, sf_dir, tables=("orders", "nation"), register_views=False
    )
    fact = rfb_fixture_from_orders(tables["orders"])
    dim = tables["nation"].select(
        F.col("n_nationkey").cast("long").alias("codigo")
    )
    nulls = v2_null_essentials(fact, _FIXTURE_TABLE).select(
        F.lit("null").alias("check_kind"),
        F.col("column").alias("col_name"),
        F.col("n_null").alias("n_bad"),
    )
    fmts = v3_format_checks(fact, _FIXTURE_TABLE).select(
        F.lit("format").alias("check_kind"),
        F.col("column").alias("col_name"),
        F.col("n_bad"),
    )
    ref = (
        v4_referential(fact, dim, "codigo_municipio", "codigo")
        .agg(F.coalesce(F.sum("n_rows"), F.lit(0)).alias("n_bad"))
        .select(
            F.lit("referential").alias("check_kind"),
            F.lit("codigo_municipio").alias("col_name"),
            F.col("n_bad"),
        )
        .filter(F.col("n_bad") > 0)
    )
    return nulls.unionByName(fmts).unionByName(ref)


# The twin counts the INJECTION predicates (sign-safe modulo mirrors
# pmod); Spark counts what the DETECTORS found. Equality pins the
# detector logic — e.g. v3 counting NULLs as format violations, or v4
# dropping NULL-key rows incorrectly, breaks the hash.
_V01_SQL = """
WITH rows_v AS (
  SELECT 'null' AS check_kind, 'cnpj_ordem' AS col_name,
         CAST(sum(CASE WHEN ((o_orderkey % 97 + 97) % 97) = 0
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_bad
  FROM orders
  UNION ALL
  SELECT 'format', 'uf',
         CAST(sum(CASE WHEN ((o_orderkey % 89 + 89) % 89) = 0
                  THEN 1 ELSE 0 END) AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'format', 'cep',
         CAST(sum(CASE WHEN ((o_orderkey % 83 + 83) % 83) = 0
                  THEN 1 ELSE 0 END) AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'referential', 'codigo_municipio', CAST(count(*) AS BIGINT)
  FROM orders
  WHERE ((o_orderkey % 30 + 30) % 30)
        NOT IN (SELECT n_nationkey FROM nation)
)
SELECT check_kind, col_name, n_bad FROM rows_v WHERE n_bad > 0
"""


# --------------------------------------------------------------------------
# v02 — duplicate-business-keys + count-reconciliation report: the
# other half of the README integrity contract (v5 duplicate
# (cnpj_basico, cnpj_ordem, cnpj_dv) detection, FIXTURES.md, plus the
# v1/A7/A13 count-equality gate as data). Duplicates are injected BY
# CONSTRUCTION via the accidental-reload shape every warehouse has
# seen: the estabelecimentos-shaped fixture is orders keyed 1:1, UNION
# ALL a deterministic ~3% re-loaded slice (o_orderkey % 31 == 0) —
# so exactly those keys carry multiplicity 2 and the oracle twin
# recomputes every figure from the slice rule. The count gate
# (n_fixture_rows vs n_base_rows + n_reloaded) rides in the output:
# a fixture builder that drops or fabricates rows breaks the hash.
#
# Scale: one groupBy over the fact side (map-side partial combine)
# plus two counts — no joins, no windows.


def cnpj_triple(k):
    """(cnpj_basico, cnpj_ordem, cnpj_dv) derived INJECTIVELY from a
    key column (ADVICE r07): basico carries k mod 1e8 and ordem the
    Euclidean quotient floor(k/1e8) mod 1e4, so together they
    reconstruct any k in [0, 1e12) uniquely (k = q*1e8 + r) — without
    the quotient, distinct base rows past 1e8 (TPC-H sf >= ~17) would
    collide into duplicate triples that v5 counts but the %31-slice
    oracle twin does not. Keys outside [0, 1e12) fail LOUD via
    assert_true instead of silently breaking the hash."""
    guard = F.assert_true(
        (k >= 0) & (k < F.lit(10**12)),
        "v02 key derivation is injective only for 0 <= o_orderkey < 1e12",
    )
    return (
        F.lpad(F.pmod(k, F.lit(100000000)).cast("string"), 8, "0").alias(
            "cnpj_basico"
        ),
        F.when(
            guard.isNull(),
            F.lpad(
                F.pmod(F.floor(k / F.lit(100000000)), F.lit(10000)).cast(
                    "string"
                ),
                4,
                "0",
            ),
        ).alias("cnpj_ordem"),
        F.lpad(F.pmod(k, F.lit(100)).cast("string"), 2, "0").alias("cnpj_dv"),
    )


def v02_duplicate_keys_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rfb_data_pipeline_spark.pipeline.validate import v5_duplicate_keys

    orders = load_tables(
        spark, sf_dir, tables=("orders",), register_views=False
    )["orders"]
    keyed = orders.select(
        *cnpj_triple(F.col("o_orderkey")),
        F.col("o_orderkey").alias("_k"),
    )
    fixture = keyed.unionByName(
        keyed.where(F.pmod(F.col("_k"), F.lit(31)) == 0)  # the re-load
    ).drop("_k")
    dups = v5_duplicate_keys(
        fixture, ["cnpj_basico", "cnpj_ordem", "cnpj_dv"]
    )
    n_fix = fixture.agg(F.count(F.lit(1)).alias("n_fixture_rows"))
    return dups.agg(
        F.count(F.lit(1)).alias("n_duplicate_keys"),
        F.coalesce(F.sum("n_copies"), F.lit(0)).alias("n_rows_in_dups"),
        F.coalesce(F.max("n_copies"), F.lit(0)).alias("max_multiplicity"),
    ).join(F.broadcast(n_fix), F.lit(True)).select(
        "n_duplicate_keys",
        "n_rows_in_dups",
        "max_multiplicity",
        "n_fixture_rows",
    )


# the twin recomputes the same report from the re-load slice rule
_V02_SQL = """
WITH reloaded AS (
  SELECT count(*) AS n31 FROM orders
  WHERE ((o_orderkey % 31 + 31) % 31) = 0
),
base AS (SELECT count(*) AS n FROM orders)
SELECT CAST(n31 AS BIGINT) AS n_duplicate_keys,
       CAST(2 * n31 AS BIGINT) AS n_rows_in_dups,
       CAST(CASE WHEN n31 > 0 THEN 2 ELSE 0 END AS BIGINT)
         AS max_multiplicity,
       CAST(n + n31 AS BIGINT) AS n_fixture_rows
FROM reloaded, base
"""


QUERIES = {
    "v01_integrity_report": v01_integrity_report,
    "v02_duplicate_keys_report": v02_duplicate_keys_report,
}

ORACLE: dict[str, str] = {
    "v01_integrity_report": _V01_SQL,
    "v02_duplicate_keys_report": _V02_SQL,
}
