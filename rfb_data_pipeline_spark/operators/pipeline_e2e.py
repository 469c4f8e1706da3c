"""Driver-visible row for the END-TO-END RFB monthly pipeline.

Through r09 the full lifecycle (SURVEY.md §3.1: discover → download →
extract → sniff/correct → load → validate → report) was pytest-only
(tests/test_orchestrator.py); every other Tier-A operator had a driver
row. This module puts the lifecycle ITSELF under the DuckDB value hash
(VERDICT r09 item 2, the registry's 150th slot):

``p01_pipeline_month_e2e`` synthesizes a deterministic fixture month
FROM the ``orders``/``nation`` parquet (the v01 injected-violation
discipline — every figure is recomputable from injection predicates):

- a two-part ``rfb_empresas`` drop (Empresas0/1.zip) derived from
  ``orders``, one CSV line per order key ``k``, plus an accidental
  re-load slice (every ``k % 31 == 0`` line appears twice → v5
  duplicates);
- injected violations: empty ``razao_social`` every ``% 97`` (v2
  null), 9-digit ``cnpj_basico`` every ``% 83`` (v3 format — 9 digits
  because ``zero_pad`` would repair a SHORT value), and
  ``natureza_juridica = pmod(k, 30)`` against the 25-key ``nation``
  dimension (v4 referential orphans on codes 25-29);
- a clean single-part ``rfb_cnaes`` drop derived from ``nation``;
- an extractable zip with an unroutable member → status ``ignorada``.

It then runs the REAL orchestrator (``pipeline/run.py::run_month`` —
manifest lattice, sniffed encodings, grouped multi-part load, atomic
partition overwrite, Observation-carried validation counters), reads
back what the pipeline WROTE, runs the REAL detectors from
``pipeline/validate.py`` over the silver parquet, and emits ONE
summary row. The DuckDB twin recomputes every column from the
injection predicates — so the hash gates the whole lifecycle: routing,
encoding, CSV parsing, silver typing, the count gate, the status
lattice (the violating empresas load must FAIL its zips while the
clean cnaes load succeeds and the unroutable zip is ignored), and all
five validation classes.

Reference parity: this is the reference's entire src/main.py lifecycle
(§3.1 plan→report, status vocabulary pendente/sucesso/falhou/ignorada)
exercised as one audited row.

Scale: the fixture is written DISTRIBUTED (a Spark text write of the
line expressions — one WholeStageCodegen projection over the orders
scan); the driver only packages the written parts into the portal zips
(control-plane file I/O, the download-fixture idiom). The pipeline
load and every detector are the production operators themselves —
scan-side aggregates, one broadcast anti-join. The summary collect is
a bounded set of 1-row aggregates (control-plane constants).
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile
import zipfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rfb_data_pipeline_spark.catalog import load_tables

_REF_YM = "202406"


def _file_fetch(url: str) -> str:
    assert url.startswith("file://")
    with open(url[len("file://") :], encoding="utf-8") as f:
        return f.read()


def _file_stream(url: str, dest: str) -> int:
    assert url.startswith("file://")
    shutil.copyfile(url[len("file://") :], dest)
    return os.path.getsize(dest)


def _empresas_lines(orders: DataFrame) -> DataFrame:
    """(k, value) — one headerless ';' CSV line per order key, with
    the v2/v3 violations injected by construction. Key-injectivity of
    (cnpj_basico, razao_social) needs k < 1e8 (the v02 guard idiom:
    fail LOUD rather than silently breaking the oracle hash)."""
    k = F.col("o_orderkey")
    guard = F.assert_true(
        (k >= 0) & (k < F.lit(10**8)),
        "p01 fixture derivation is injective only for 0 <= o_orderkey < 1e8",
    )
    k8 = F.lpad(F.pmod(k, F.lit(10**8)).cast("string"), 8, "0")
    cnpj = F.when(
        F.pmod(k, F.lit(83)) == 0, F.concat(F.lit("9"), k8)
    ).otherwise(k8)
    razao = F.when(F.pmod(k, F.lit(97)) == 0, F.lit("")).otherwise(
        F.concat(F.lit("EMPRESA AÇÃO "), k.cast("string"))
    )
    natureza = F.pmod(k, F.lit(30)).cast("string")
    capital = F.concat(
        F.pmod(k, F.lit(10000)).cast("string"),
        F.lit(","),
        F.lpad(F.pmod(k, F.lit(100)).cast("string"), 2, "0"),
    )
    porte = F.lpad(F.pmod(k, F.lit(4)).cast("string"), 2, "0")
    line = F.concat_ws(
        ";", cnpj, razao, natureza, F.lit("49"), capital, porte, F.lit("")
    )
    return orders.select(
        F.when(guard.isNull(), k).alias("k"), line.alias("value")
    )


def _cnaes_lines(nation: DataFrame) -> DataFrame:
    return nation.select(
        F.concat_ws(
            ";",
            F.lpad(F.col("n_nationkey").cast("string"), 7, "0"),
            F.col("n_name"),
        ).alias("value")
    )


def _spark_text_to_zip(text_dir: str, zip_path: str, member: str) -> None:
    """Package a Spark text-write output directory into one zip member
    (concatenated parts — row order is irrelevant to every summary
    figure). Control-plane file I/O, the download-fixture idiom;
    STREAMED part by part so driver memory stays O(chunk), not
    O(table) (r10 review follow-up)."""
    with zipfile.ZipFile(zip_path, "w") as zf:
        with zf.open(member, "w") as out:
            for part in sorted(glob.glob(os.path.join(text_dir, "part-*"))):
                if part.endswith(".crc"):
                    continue
                with open(part, "rb") as f:
                    shutil.copyfileobj(f, out, length=1 << 20)


def _listing_html(names: list[str]) -> str:
    anchors = "".join(f'<a href="{n}">{n}</a><br>' for n in names)
    return f"<html><body><h1>Index of /cnpj</h1>{anchors}</body></html>"


def p01_pipeline_month_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row lifecycle summary: manifest status tally + load gate +
    v1-v5 detector counts over the silver the pipeline wrote."""
    from rfb_data_pipeline_spark.pipeline import manifest as mf
    from rfb_data_pipeline_spark.pipeline.run import RunConfig, run_month
    from rfb_data_pipeline_spark.pipeline.validate import (
        v2_null_essentials,
        v3_format_checks,
        v4_referential,
        v5_duplicate_keys,
    )

    tables = load_tables(
        spark, sf_dir, tables=("orders", "nation"), register_views=False
    )
    root = tempfile.mkdtemp(prefix="p01_e2e_")
    try:
        portal = os.path.join(root, "portal")
        os.makedirs(portal)

        # ---- fixture month: distributed line derivation, zipped drop.
        # stage_boundary: the union references `lines` twice and the
        # two parity writes re-evaluate the whole frame — without the
        # boundary that is 4 scans of orders per invocation (r10
        # review); with it, one.
        from rfb_data_pipeline_spark.plans.stage import stage_boundary

        lines = _empresas_lines(tables["orders"]).transform(stage_boundary)
        fixture = lines.unionAll(
            lines.where(F.pmod(F.col("k"), F.lit(31)) == 0)  # the re-load
        )
        for part, zip_name, member in (
            (0, "Empresas0.zip", "K001.EMPRECSV"),
            (1, "Empresas1.zip", "K009.EMPRECSV"),
        ):
            tdir = os.path.join(root, f"txt_emp{part}")
            fixture.where(F.pmod(F.col("k"), F.lit(2)) == part).select(
                "value"
            ).write.mode("overwrite").text(tdir)
            _spark_text_to_zip(tdir, os.path.join(portal, zip_name), member)
        cn_dir = os.path.join(root, "txt_cnae")
        _cnaes_lines(tables["nation"]).coalesce(1).write.mode(
            "overwrite"
        ).text(cn_dir)
        _spark_text_to_zip(
            cn_dir, os.path.join(portal, "Cnaes.zip"), "K002.CNAECSV"
        )
        with zipfile.ZipFile(os.path.join(portal, "Notas1.zip"), "w") as zf:
            zf.writestr("LEIAME.TXT", "conteudo nao roteavel\n")
        with open(
            os.path.join(portal, "index.html"), "w", encoding="utf-8"
        ) as f:
            f.write(
                _listing_html(
                    ["Empresas0.zip", "Empresas1.zip", "Cnaes.zip", "Notas1.zip"]
                )
            )

        # ---- the REAL pipeline, end to end
        out_dir = os.path.join(root, "silver")
        report = run_month(
            spark,
            RunConfig(
                base_url=f"file://{portal}/index.html",
                work_dir=os.path.join(root, "work"),
                out_dir=out_dir,
                ref_ym=_REF_YM,
                fetch=_file_fetch,
                stream=_file_stream,
            ),
        )

        # ---- manifest tally + load gate (A16/A7; bounded collects)
        statuses = [
            r.status_carga
            for r in mf.load_manifest(spark, report.manifest_path).collect()
        ]
        files_sucesso = statuses.count(mf.SUCCESS)
        files_falhou = statuses.count(mf.FAILED)
        files_ignorada = statuses.count(mf.IGNORED)
        tables_loaded = len(report.loads)
        loads_count_gate_ok = sum(
            1
            for lr in report.loads
            if lr.validations["count_gate"]["passed"] and lr.n_corrupt == 0
        )
        loads_passed = sum(1 for lr in report.loads if lr.passed)

        # ---- the REAL detectors over what the pipeline WROTE
        emp = spark.read.parquet(os.path.join(out_dir, "rfb_empresas")).where(
            F.col("ref_ym") == _REF_YM
        )
        cna = spark.read.parquet(os.path.join(out_dir, "rfb_cnaes")).where(
            F.col("ref_ym") == _REF_YM
        )
        empresas_rows = emp.count()
        cnaes_rows = cna.count()
        null_razao_rows = (
            v2_null_essentials(emp, "rfb_empresas")
            .where(F.col("column") == "razao_social")
            .agg(F.coalesce(F.sum("n_null"), F.lit(0)).alias("n"))
            .first()["n"]
        )
        bad_cnpj_rows = (
            v3_format_checks(emp, "rfb_empresas")
            .where(F.col("column") == "cnpj_basico")
            .agg(F.coalesce(F.sum("n_bad"), F.lit(0)).alias("n"))
            .first()["n"]
        )
        orphan_natureza_rows = (
            v4_referential(
                emp.select(
                    F.col("natureza_juridica").cast("long").alias("natureza")
                ),
                tables["nation"].select(
                    F.col("n_nationkey").cast("long").alias("codigo")
                ),
                "natureza",
                "codigo",
            )
            .agg(F.coalesce(F.sum("n_rows"), F.lit(0)).alias("n"))
            .first()["n"]
        )
        dup = (
            v5_duplicate_keys(
                emp.select("cnpj_basico", "razao_social"),
                ["cnpj_basico", "razao_social"],
            )
            .agg(
                F.count(F.lit(1)).alias("nk"),
                F.coalesce(F.sum("n_copies"), F.lit(0)).alias("nr"),
            )
            .first()
        )
        sum_capital_cents = emp.agg(
            F.coalesce(
                F.sum((F.col("capital_social") * 100).cast("long")), F.lit(0)
            ).alias("c")
        ).first()["c"]
    finally:
        shutil.rmtree(root, ignore_errors=True)

    return spark.createDataFrame(
        [
            (
                files_sucesso,
                files_falhou,
                files_ignorada,
                tables_loaded,
                loads_count_gate_ok,
                loads_passed,
                empresas_rows,
                cnaes_rows,
                int(null_razao_rows),
                int(bad_cnpj_rows),
                int(orphan_natureza_rows),
                int(dup["nk"]),
                int(dup["nr"]),
                int(sum_capital_cents),
            )
        ],
        "files_sucesso bigint, files_falhou bigint, files_ignorada bigint, "
        "tables_loaded bigint, loads_count_gate_ok bigint, "
        "loads_passed bigint, empresas_rows bigint, cnaes_rows bigint, "
        "null_razao_rows bigint, bad_cnpj_rows bigint, "
        "orphan_natureza_rows bigint, dup_keys bigint, dup_rows bigint, "
        "sum_capital_cents bigint",
    )


# The twin recomputes every figure from the INJECTION predicates; the
# Spark side produces them through the REAL pipeline + detectors over
# the silver it wrote. Status/gate columns are lattice constants BY
# CONSTRUCTION (1 clean load sucesso, the violating empresas load
# falhou across both its zips, the unroutable zip ignorada) — the
# pipeline must actually reproduce them or the hash breaks.
_P01_SQL = """
WITH base AS (SELECT o_orderkey AS k FROM orders),
fix AS (
  SELECT k FROM base
  UNION ALL
  SELECT k FROM base WHERE ((k % 31 + 31) % 31) = 0
),
n31 AS (
  SELECT count(*) AS n FROM base WHERE ((k % 31 + 31) % 31) = 0
)
SELECT
  CAST(1 AS BIGINT) AS files_sucesso,
  CAST(2 AS BIGINT) AS files_falhou,
  CAST(1 AS BIGINT) AS files_ignorada,
  CAST(2 AS BIGINT) AS tables_loaded,
  CAST(2 AS BIGINT) AS loads_count_gate_ok,
  CAST(1 AS BIGINT) AS loads_passed,
  CAST(count(*) AS BIGINT) AS empresas_rows,
  (SELECT CAST(count(*) AS BIGINT) FROM nation) AS cnaes_rows,
  CAST(sum(CASE WHEN ((k % 97 + 97) % 97) = 0 THEN 1 ELSE 0 END)
       AS BIGINT) AS null_razao_rows,
  CAST(sum(CASE WHEN ((k % 83 + 83) % 83) = 0 THEN 1 ELSE 0 END)
       AS BIGINT) AS bad_cnpj_rows,
  CAST(sum(CASE WHEN ((k % 30 + 30) % 30)
           NOT IN (SELECT n_nationkey FROM nation) THEN 1 ELSE 0 END)
       AS BIGINT) AS orphan_natureza_rows,
  (SELECT CAST(n AS BIGINT) FROM n31) AS dup_keys,
  (SELECT CAST(2 * n AS BIGINT) FROM n31) AS dup_rows,
  CAST(sum(((k % 10000 + 10000) % 10000) * 100 + ((k % 100 + 100) % 100))
       AS BIGINT) AS sum_capital_cents
FROM fix
"""


QUERIES = {"p01_pipeline_month_e2e": p01_pipeline_month_e2e}
ORACLE: dict[str, str] = {"p01_pipeline_month_e2e": _P01_SQL}
