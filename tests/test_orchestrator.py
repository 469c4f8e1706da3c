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


# -- round-9 review regressions --------------------------------------------


def test_multipart_table_held_until_every_part_arrives(spark, tmp_path):
    """A failed Empresas1.zip must HOLD rfb_empresas (not ship a
    half-complete partition marked sucesso), while unrelated tables
    still load; the resume then loads BOTH parts in one call."""
    p = tmp_path / "portal"
    p.mkdir()
    with zipfile.ZipFile(p / "Empresas0.zip", "w") as zf:
        zf.writestr(
            "K001.EMPRECSV", (EMPRESAS[0] + "\n").encode("latin-1")
        )
    (p / "Empresas1.zip").write_bytes(b"NOT A ZIP")  # fails extract
    with zipfile.ZipFile(p / "Cnaes.zip", "w") as zf:
        zf.writestr("K002.CNAECSV", "\n".join(CNAES) + "\n")
    (p / "index.html").write_text(
        _listing_html(["Empresas0.zip", "Empresas1.zip", "Cnaes.zip"])
    )
    cfg = RunConfig(
        base_url=f"file://{p}/index.html",
        work_dir=str(tmp_path / "work"),
        out_dir=str(tmp_path / "silver"),
        ref_ym="202405",
        fetch=_file_fetch,
        stream=_file_stream,
    )
    report = run_month(spark, cfg)
    # the unaffected table loaded; the incomplete one was held
    assert {lr.table for lr in report.loads} == {"rfb_cnaes"}
    assert report.held_for == ["Empresas1.zip"]
    assert not os.path.exists(str(tmp_path / "silver" / "rfb_empresas"))
    m = mf.load_manifest(spark, report.manifest_path)
    st = {r.arquivo: r for r in m.collect()}
    # the healthy part stays PENDING (not falsely sucesso)
    assert st["Empresas0.zip"].status_carga == mf.PENDING
    assert st["Cnaes.zip"].status_carga == mf.SUCCESS

    # heal the portal; resume must load BOTH parts together
    with zipfile.ZipFile(p / "Empresas1.zip", "w") as zf:
        zf.writestr(
            "K009.EMPRECSV", (EMPRESAS[1] + "\n").encode("latin-1")
        )
    report2 = run_month(spark, cfg)
    assert {lr.table for lr in report2.loads} == {"rfb_empresas"}
    assert report2.held_for == []
    emp = spark.read.parquet(str(tmp_path / "silver" / "rfb_empresas"))
    assert emp.count() == 2  # both parts in one atomic partition write
    m2 = mf.load_manifest(spark, report2.manifest_path)
    assert all(r.status_carga == mf.SUCCESS for r in m2.collect())


def test_extract_survives_vanished_zip(spark, portal, tmp_path):
    """A zip that vanished after the manifest recorded its download
    (crash between os.remove and save_manifest) must self-heal back to
    pending download, not abort every resume (r09 review)."""
    cfg = RunConfig(
        base_url=f"file://{portal}/index.html",
        work_dir=str(tmp_path / "work"),
        out_dir=str(tmp_path / "silver"),
        ref_ym="202405",
        fetch=_file_fetch,
        stream=_file_stream,
    )
    report = run_month(spark, cfg)  # Socios0 healed to pending
    # simulate the wedge: mark Socios0 downloaded at a path that does
    # not exist (the crash-window manifest state)
    m = mf.load_manifest(spark, report.manifest_path)
    upd = spark.createDataFrame(
        [("Socios0.zip", mf.SUCCESS, str(tmp_path / "work/zips/gone.zip"))],
        "arquivo string, new_status_download string, new_caminho_zip string",
    )
    mf.save_manifest(mf.apply_updates(m, upd), report.manifest_path)
    report2 = run_month(spark, cfg)  # must not raise
    m2 = mf.load_manifest(spark, report2.manifest_path)
    socios = next(r for r in m2.collect() if r.arquivo == "Socios0.zip")
    # healed back to pending download (or already re-downloaded if the
    # portal had it — here the portal copy is still corrupt, so the
    # extract self-heal leaves it pending again)
    assert socios.status_carga == mf.PENDING


def test_discovery_dedupes_double_anchors(tmp_path):
    """Apache-autoindex listings carry icon+name anchors per file —
    one manifest row each, not two racing downloads (r09 review)."""
    p = tmp_path / "portal2"
    p.mkdir()
    (p / "index.html").write_text(
        "<html><body>"
        '<a href="Empresas0.zip"><img src="i.gif"></a>'
        '<a href="Empresas0.zip">Empresas0.zip</a>'
        '<a href="Cnaes.zip">Cnaes.zip</a>'
        "</body></html>"
    )
    files = discover_files(f"file://{p}/index.html", fetch=_file_fetch)
    assert [f[0] for f in files] == ["Empresas0.zip", "Cnaes.zip"]


def test_manifest_roundtrip_survives_key_reorder(spark, portal, tmp_path):
    """validacoes fields must load BY NAME: a key-sorted manifest (any
    JSON tool) used to silently permute the counts (r09 review)."""
    import json

    cfg = RunConfig(
        base_url=f"file://{portal}/index.html",
        work_dir=str(tmp_path / "work"),
        out_dir=str(tmp_path / "silver"),
        ref_ym="202405",
        fetch=_file_fetch,
        stream=_file_stream,
    )
    report = run_month(spark, cfg)
    with open(report.manifest_path, encoding="utf-8") as f:
        records = json.load(f)
    before = {
        r["arquivo"]: r["validacoes"] for r in records if r["validacoes"]
    }
    assert before, "fixture produced no validacoes"
    with open(report.manifest_path, "w", encoding="utf-8") as f:
        json.dump(records, f, sort_keys=True)  # permute all keys
    m = mf.load_manifest(spark, report.manifest_path)
    for r in m.collect():
        if r.validacoes is None:
            continue
        want = before[r.arquivo]
        assert r.validacoes.linhas_originais == want["linhas_originais"]
        assert r.validacoes.registros_no_banco == want["registros_no_banco"]


def test_member_name_collision_fails_loud(spark, tmp_path):
    """r11 review: two zips carrying the SAME member name extract into
    one shared dir (last wins) and the repeated path would ride
    csv_paths twice — doubling that file's rows past the count gate,
    which compares two counts of the same doubled scan. A collision
    must abort the month loudly, naming both zips."""
    p = tmp_path / "portal"
    p.mkdir()
    with zipfile.ZipFile(p / "Empresas0.zip", "w") as zf:
        zf.writestr("K001.EMPRECSV", EMPRESAS[0] + "\n")
    with zipfile.ZipFile(p / "Empresas1.zip", "w") as zf:
        zf.writestr("K001.EMPRECSV", EMPRESAS[1] + "\n")  # same member!
    (p / "index.html").write_text(
        _listing_html(["Empresas0.zip", "Empresas1.zip"])
    )
    cfg = RunConfig(
        base_url=f"file://{p}/index.html",
        work_dir=str(tmp_path / "work"),
        out_dir=str(tmp_path / "silver"),
        ref_ym="202405",
        fetch=_file_fetch,
        stream=_file_stream,
    )
    with pytest.raises(RuntimeError, match="K001.EMPRECSV"):
        run_month(spark, cfg)


def test_unroutable_member_collision_does_not_abort(spark, tmp_path):
    """ADVICE r11: two zips sharing an UNROUTABLE member name (a
    readme/layout file _route_one maps to None, never loaded) cannot
    double-count rows — the month must still load, not hard-fail on a
    file that never feeds csv_paths."""
    p = tmp_path / "portal"
    p.mkdir()
    with zipfile.ZipFile(p / "Empresas0.zip", "w") as zf:
        zf.writestr("K001.EMPRECSV", EMPRESAS[0] + "\n")
        zf.writestr("LEIAME.txt", "layout v1\n")  # unroutable
    with zipfile.ZipFile(p / "Cnaes.zip", "w") as zf:
        zf.writestr("K001.CNAECSV", CNAES[0] + "\n")
        zf.writestr("LEIAME.txt", "layout v2\n")  # same member name!
    (p / "index.html").write_text(
        _listing_html(["Empresas0.zip", "Cnaes.zip"])
    )
    cfg = RunConfig(
        base_url=f"file://{p}/index.html",
        work_dir=str(tmp_path / "work"),
        out_dir=str(tmp_path / "silver"),
        ref_ym="202405",
        fetch=_file_fetch,
        stream=_file_stream,
    )
    report = run_month(spark, cfg)
    assert report.loads and report.passed, (
        "month should load despite the collision"
    )


def test_duplicate_member_within_one_zip_counts_once(spark, tmp_path):
    """A single archive listing the same member name twice (legal in
    the zip format; extractall keeps the last) must load that file
    ONCE — appending the path per entry double-read its rows, and the
    count gate couldn't see it (both sides doubled)."""
    import io

    p = tmp_path / "portal"
    p.mkdir()
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("K001.EMPRECSV", EMPRESAS[0] + "\n")
        zf.writestr("K001.EMPRECSV", "\n".join(EMPRESAS) + "\n")
    (p / "Empresas0.zip").write_bytes(buf.getvalue())
    (p / "index.html").write_text(_listing_html(["Empresas0.zip"]))
    cfg = RunConfig(
        base_url=f"file://{p}/index.html",
        work_dir=str(tmp_path / "work"),
        out_dir=str(tmp_path / "silver"),
        ref_ym="202405",
        fetch=_file_fetch,
        stream=_file_stream,
    )
    report = run_month(spark, cfg)
    assert report.passed
    emp = spark.read.parquet(str(tmp_path / "silver" / "rfb_empresas"))
    # the LAST entry's content (2 rows), counted exactly once
    assert emp.count() == 2
