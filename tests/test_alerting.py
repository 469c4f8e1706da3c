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


_STALLED = (  # no stage FAILED, but carga never reached SUCCESS
    "Cnaes0.zip", "u", mf.SUCCESS, mf.SUCCESS, mf.SUCCESS, mf.PENDING,
    1, None, [], (2, 2, None),
)


def test_pending_files_are_not_a_success(spark):
    """ADVICE r06: 'todos os arquivos foram processados' must not go
    out while files are still PENDING — no-FAILED is not all-SUCCESS."""
    alert = alerting.evaluate_run(_manifest(spark, [_OK, _STALLED]), "202405")
    assert alert.severity == "failure"
    assert "incompleta" in alert.subject
    assert "1 de 2" in alert.subject
    assert "prontos para uso" not in alert.body
    # all-success still mails success
    ok = alerting.evaluate_run(_manifest(spark, [_OK]), "202405")
    assert ok.severity == "success"


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


def test_unexpected_crash_sends_failure_alert_and_loop_survives(
    spark, portal, tmp_path, monkeypatch
):
    """ADVICE r06 (medium): an exception run_month does NOT anticipate
    (anything beyond BadZipFile/count-gate) must still produce a
    failure alert — 'the pipeline stopped' is the scenario the alerting
    exists for — and must not kill vigilante_daily."""
    from rfb_data_pipeline_spark.pipeline import run as run_mod

    _publish(portal)
    sent: list[tuple[str, str]] = []

    def boom(spark_, cfg_):
        raise RuntimeError("disk full while writing silver")

    monkeypatch.setattr(run_mod, "run_month", boom)

    def cfg_for(ref_ym: str) -> RunConfig:
        return RunConfig(
            base_url=f"file://{portal}/index.html",
            work_dir=str(tmp_path / "work"),
            out_dir=str(tmp_path / "silver"),
            ref_ym=ref_ym,
            fetch=_file_fetch,
            stream=_file_stream,
        )

    results = alerting.vigilante_daily(
        spark,
        cfg_for,
        lambda: "202406",
        transport=lambda s, b: sent.append((s, b)),
        already_loaded=lambda ym: False,
        max_checks=2,
        sleep=lambda s: None,
    )
    # BOTH checks completed: the crash alerted and the loop continued
    assert len(results) == 2
    assert all(r.triggered and r.alert.severity == "failure" for r in results)
    assert len(sent) == 2
    assert "erro inesperado" in sent[0][0] and "RuntimeError" in sent[0][0]
    assert "disk full while writing silver" in sent[0][1]


def test_check_month_published_distinguishes_absent_from_bugs():
    """ADVICE r06: fetch errors that mean 'listing absent' return
    False; a parser/config regression must propagate, not probe
    forever."""
    def fetch_404(url: str) -> str:
        raise FileNotFoundError(url)

    assert alerting.check_month_published("file:///nope", fetch_404) is False

    import urllib.error

    def fetch_http_err(url: str) -> str:
        raise urllib.error.URLError("temporary name resolution failure")

    assert alerting.check_month_published("https://x/", fetch_http_err) is False

    def fetch_buggy(url: str) -> str:
        raise ValueError("misconfigured base_url template")

    with pytest.raises(ValueError):
        alerting.check_month_published("oops-{ym}", fetch_buggy)


def test_check_month_published_survives_malformed_http(monkeypatch):
    """ADVICE r07: a flaky server's malformed response surfaces as
    http.client.HTTPException subclasses (BadStatusLine,
    IncompleteRead, RemoteDisconnected) from urlopen/read — the probe
    must treat these as 'listing absent' (transient), not crash the
    long-lived vigilante_daily loop."""
    import http.client

    for exc in (
        http.client.BadStatusLine("HTT/1.1 garbage"),
        http.client.IncompleteRead(b"partial body"),
        http.client.RemoteDisconnected("closed without response"),
    ):
        def fetch_flaky(url: str, _e=exc) -> str:
            raise _e

        assert (
            alerting.check_month_published("https://x/", fetch_flaky) is False
        ), type(exc).__name__

    # ...and the daily loop keeps running across such a day: one flaky
    # probe day followed by a clean not-published day, no exception.
    sent = []

    class _T:
        def send(self, subject, body):
            sent.append(subject)

    calls = {"n": 0}

    def fetch_alternating(url: str) -> str:
        calls["n"] += 1
        if calls["n"] == 1:
            raise http.client.RemoteDisconnected("flaky")
        raise FileNotFoundError(url)  # genuinely not published yet

    class _Cfg:
        ref_ym = "2024-05"
        base_url = "https://x/"
        fetch = staticmethod(fetch_alternating)

    results = alerting.vigilante_daily(
        spark=None,
        cfg_for_month=lambda ym: _Cfg(),
        next_month=lambda: "2024-05",
        transport=_T(),
        already_loaded=lambda ym: False,
        max_checks=2,
        sleep=lambda s: None,
    )
    assert [r.published for r in results] == [False, False]
    assert sent == []


def test_ignored_files_do_not_block_success(spark):
    """status_carga='ignorada' is a TERMINAL non-failure state (a zip
    whose members route to no table) — it must not raise the monthly
    'carga incompleta' alert or make success unreachable (r09
    review)."""
    from rfb_data_pipeline_spark.pipeline import manifest as mf
    from rfb_data_pipeline_spark.pipeline.alerting import evaluate_run

    m = mf.new_manifest(
        spark, [("A.zip", "http://x/A.zip"), ("B.zip", "http://x/B.zip")]
    )
    done = spark.createDataFrame(
        [
            ("A.zip", mf.SUCCESS, mf.SUCCESS, mf.SUCCESS, mf.SUCCESS),
            ("B.zip", mf.SUCCESS, mf.SUCCESS, mf.SUCCESS, mf.IGNORED),
        ],
        "arquivo string, new_status_download string, "
        "new_status_extracao string, new_status_correcao string, "
        "new_status_carga string",
    )
    alert = evaluate_run(mf.apply_updates(m, done), "202405")
    assert alert.severity == "success"


def test_empty_manifest_is_a_failure_alert(spark):
    """r11 review: an EMPTY manifest must never mail 'todos os 0
    arquivos foram processados' as a success — a month believed
    loadable whose discovery produced nothing is exactly the signal
    the alert exists to surface. (Unreachable via vigilante_once,
    whose publication probe requires >0 zips; evaluate_run is a
    library surface.)"""
    alert = alerting.evaluate_run(_manifest(spark, []), "202405")
    assert alert.severity == "failure"
    assert "manifesto vazio" in alert.subject
    assert "202405" in alert.subject
