"""Alerting + vigilante scheduler (READme.md:8-9,33-34 — promised by
the reference README, absent from its code): success notification,
detailed failure alert (file + stage + why), and the daily publication
probe that triggers the month load exactly once."""

from __future__ import annotations

import os
import zipfile

import pytest

from rfb_data_pipeline_spark.pipeline import alerting, manifest as mf
from rfb_data_pipeline_spark.pipeline.run import RunConfig


def _manifest(spark, rows):
    return spark.createDataFrame(rows, mf.MANIFEST_SCHEMA)


_OK = (
    "Empresas0.zip", "u", mf.SUCCESS, mf.SUCCESS, mf.SUCCESS, mf.SUCCESS,
    1, None, [], (2, 2, 2),
)
_BAD = (
    "Socios0.zip", "u", mf.SUCCESS, mf.SUCCESS, mf.FAILED, mf.PENDING,
    3, None, [], (5, 4, None),
)


def test_success_alert(spark):
    alert = alerting.evaluate_run(_manifest(spark, [_OK]), "202405")
    assert alert.severity == "success"
    assert "202405" in alert.subject and "sucesso" in alert.subject
    assert "prontos para uso" in alert.body


def test_failure_alert_names_file_stage_and_why(spark):
    alert = alerting.evaluate_run(_manifest(spark, [_OK, _BAD]), "202405")
    assert alert.severity == "failure"
    assert "ALERTA" in alert.subject and "1 arquivo" in alert.subject
    # exactly WHERE and WHY (READme.md:34)
    assert "Socios0.zip" in alert.body
    assert "'correcao'" in alert.body
    assert "tentativas_download=3" in alert.body
    assert "linhas_corrigidas=4" in alert.body
    assert "Empresas0.zip" not in alert.body  # healthy files stay out


def test_failure_details_is_bounded_and_ordered(spark):
    det = alerting.failure_details(_manifest(spark, [_BAD, _OK])).collect()
    assert [(r["arquivo"], r["failed_stage"]) for r in det] == [
        ("Socios0.zip", "correcao")
    ]


# --- vigilante -------------------------------------------------------------

_EMPRESAS = ['00000001;"ACAO COMERCIO LTDA";2062;49;"1234,56";03;']


def _file_fetch(url: str) -> str:
    assert url.startswith("file://")
    return open(url[len("file://"):], encoding="utf-8").read()


def _file_stream(url: str, dest: str) -> int:
    import shutil

    shutil.copyfile(url[len("file://"):], dest)
    return os.path.getsize(dest)


@pytest.fixture()
def portal(tmp_path):
    p = tmp_path / "portal"
    p.mkdir()
    return p


def _publish(portal) -> None:
    with zipfile.ZipFile(portal / "Empresas0.zip", "w") as zf:
        zf.writestr(
            "K001.EMPRECSV", ("\n".join(_EMPRESAS) + "\n").encode("latin-1")
        )
    (portal / "index.html").write_text(
        '<html><body><a href="Empresas0.zip">Empresas0.zip</a></body></html>'
    )


def test_vigilante_waits_then_triggers_once(spark, portal, tmp_path):
    sent: list[tuple[str, str]] = []
    slept: list[float] = []

    def cfg_for(ref_ym: str) -> RunConfig:
        return RunConfig(
            base_url=f"file://{portal}/index.html",
            work_dir=str(tmp_path / "work"),
            out_dir=str(tmp_path / "silver"),
            ref_ym=ref_ym,
            fetch=_file_fetch,
            stream=_file_stream,
        )

    loaded: set[str] = set()
    checks = iter(range(10))

    def next_month() -> str:
        n = next(checks)
        if n == 1:  # the month publishes between day 1 and day 2
            _publish(portal)
        return "202405"

    results = alerting.vigilante_daily(
        spark,
        cfg_for,
        next_month,
        transport=lambda s, b: sent.append((s, b)),
        already_loaded=lambda ym: ym in loaded,
        interval_sec=86400.0,
        max_checks=2,
        sleep=slept.append,
    )
    # day 1: unpublished, no trigger, no mail; day 2: published → run
    assert [(r.published, r.triggered) for r in results] == [
        (False, False),
        (True, True),
    ]
    assert slept == [86400.0]
    assert len(sent) == 1
    subject, body = sent[0]
    assert "sucesso" in subject and "202405" in subject
    assert results[1].report.passed
    assert results[1].alert.severity == "success"
    # a third check with the month recorded as loaded does NOT re-run
    loaded.add("202405")
    again = alerting.vigilante_once(
        spark, cfg_for("202405"), lambda s, b: sent.append((s, b)),
        already_loaded=lambda ym: ym in loaded,
    )
    assert again.triggered is False and len(sent) == 1
