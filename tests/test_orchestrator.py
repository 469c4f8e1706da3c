"""Full-lifecycle orchestrator tests, offline: a local 'portal'
directory served via file:// acts as the RFB listing; zips contain
latin-1 RFB CSVs; a corrupt zip exercises the self-heal transition;
a second run resumes and completes it.
"""

from __future__ import annotations

import os
import zipfile

import pytest
from pyspark.sql import functions as F

from rfb_data_pipeline_spark.functions.datestrings import (
    month_dir_name,
    month_name_ptbr,
    ref_ym,
)
from rfb_data_pipeline_spark.pipeline import manifest as mf
from rfb_data_pipeline_spark.pipeline.discovery import discover_files
from rfb_data_pipeline_spark.pipeline.download import fetch_with_retries
from rfb_data_pipeline_spark.pipeline.run import RunConfig, final_report, run_month

EMPRESAS = [
    '00000001;"AÇÃO COMÉRCIO LTDA";2062;49;"1234,56";03;',
    '00000002;"PADARIA PÃO QUENTE ME";2135;50;"0,00";01;',
]
CNAES = ["0111301;Cultivo de arroz", "4711302;Comércio varejista"]


def _listing_html(names: list[str]) -> str:
    anchors = "".join(f'<a href="{n}">{n}</a><br>' for n in names)
    return f"<html><body><h1>Index of /cnpj</h1>{anchors}</body></html>"


@pytest.fixture()
def portal(tmp_path):
    """Local portal: index.html + zips, fetchable via file://."""
    p = tmp_path / "portal"
    p.mkdir()
    with zipfile.ZipFile(p / "Empresas0.zip", "w") as zf:
        zf.writestr(
            "K001.EMPRECSV", ("\n".join(EMPRESAS) + "\n").encode("latin-1")
        )
    with zipfile.ZipFile(p / "Cnaes.zip", "w") as zf:
        zf.writestr("K002.CNAECSV", "\n".join(CNAES) + "\n")
    # a corrupt archive (self-heal path) — repaired later by the test
    (p / "Socios0.zip").write_bytes(b"NOT A ZIP")
    (p / "notes.txt").write_text("ignore me")
    (p / "index.html").write_text(
        _listing_html(["Empresas0.zip", "Cnaes.zip", "Socios0.zip"])
    )
    return p


def _file_fetch(url: str) -> str:
    assert url.startswith("file://")
    return open(url[len("file://"):], encoding="utf-8").read()


def _file_stream(url: str, dest: str) -> int:
    assert url.startswith("file://")
    import shutil

    shutil.copyfile(url[len("file://"):], dest)
    return os.path.getsize(dest)


def test_discovery_parses_only_zip_anchors(portal):
    files = discover_files(f"file://{portal}/index.html", fetch=_file_fetch)
    assert [f[0] for f in files] == ["Empresas0.zip", "Cnaes.zip", "Socios0.zip"]
    assert all(url.startswith("file://") for _, url in files)


def test_download_retries_then_succeeds(tmp_path):
    calls = {"n": 0}

    def flaky(url: str, dest: str) -> int:
        calls["n"] += 1
        if calls["n"] < 3:
            raise OSError("transient")
        open(dest, "wb").write(b"payload")
        return 7

    ok, attempts, err = fetch_with_retries(
        "file:///x", str(tmp_path / "out.zip"), stream=flaky, backoff_sec=0
    )
    assert ok and attempts == 3 and err is None

    def always_fails(url: str, dest: str) -> int:
        open(dest, "wb").write(b"partial")
        raise OSError("down")

    ok, attempts, err = fetch_with_retries(
        "file:///x", str(tmp_path / "out2.zip"), stream=always_fails, backoff_sec=0
    )
    assert not ok and attempts == 3 and "down" in err
    assert not os.path.exists(tmp_path / "out2.zip")  # no truncated file left


def test_full_month_run_with_self_heal_resume(spark, portal, tmp_path):
    cfg = RunConfig(
        base_url=f"file://{portal}/index.html",
        work_dir=str(tmp_path / "work"),
        out_dir=str(tmp_path / "silver"),
        ref_ym="202405",
        fetch=_file_fetch,
        stream=_file_stream,
    )
    report = run_month(spark, cfg)
    assert report.passed
    assert {lr.table for lr in report.loads} == {"rfb_empresas", "rfb_cnaes"}

    m = mf.load_manifest(spark, report.manifest_path)
    st = {r.arquivo: r for r in m.collect()}
    assert st["Empresas0.zip"].status_carga == mf.SUCCESS
    assert st["Cnaes.zip"].status_carga == mf.SUCCESS
    # corrupt zip self-healed back to pending download (§3.2 semantics)
    assert st["Socios0.zip"].status_download == mf.PENDING
    assert st["Socios0.zip"].status_carga == mf.PENDING

    # silver landed, typed, partitioned
    emp = spark.read.parquet(str(tmp_path / "silver" / "rfb_empresas"))
    assert emp.count() == 2
    assert str(emp.filter("cnpj_basico='00000001'").first().capital_social) == "1234.56"

    # repair the portal and RESUME: only the healed file is reprocessed
    with zipfile.ZipFile(portal / "Socios0.zip", "w") as zf:
        zf.writestr(
            "K003.SOCIOCSV",
            "00000001;2;JOAO DA SILVA;***123456**;49;20200101;;;;49;4\n",
        )
    report2 = run_month(spark, cfg)
    assert report2.passed
    assert {lr.table for lr in report2.loads} == {"rfb_socios"}  # only the healed one
    m2 = mf.load_manifest(spark, report2.manifest_path)
    assert all(r.status_carga == mf.SUCCESS for r in m2.collect())

    tally = final_report(spark, report2.manifest_path).collect()
    assert sum(r.n_files for r in tally) == 3


def test_month_name_ptbr(spark):
    df = spark.createDataFrame(
        [("2024-03-15",), ("2024-12-01",)], ["d"]
    ).select(F.col("d").cast("date").alias("d"))
    got = df.select(
        month_name_ptbr("d").alias("nome"),
        ref_ym("d").alias("ym"),
        month_dir_name("d").alias("dirname"),
    ).collect()
    assert (got[0].nome, got[0].ym, got[0].dirname) == ("Março", "202403", "3. Março")
    assert (got[1].nome, got[1].ym, got[1].dirname) == (
        "Dezembro",
        "202412",
        "12. Dezembro",
    )
