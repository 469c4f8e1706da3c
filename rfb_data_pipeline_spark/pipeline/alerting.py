"""E-mail alerting + daily "vigilante" scheduler (READme.md:8-9,33-34).

The reference README promises three behaviors its code never ships
(src/main.py has no mail or scheduling surface):

1. *vigilante mode* — check the RFB site daily for the reference
   month's publication and start the load when it appears;
2. a success notification when the load finishes and the data is
   ready;
3. a detailed failure alert saying exactly WHERE (file + stage) and
   WHY (attempt counts, count-gate numbers) the pipeline stopped.

Implemented Spark-first: alert *evaluation* is a bounded query over
the manifest (one row per failed file — never a row-level collect of
table data), *rendering* is driver-side string assembly, and the
*transport* is an injected callable — the discovery module's
transport-injection discipline (``pipeline/discovery.py:20``) — so
tests record deliveries and production wires ``smtp_transport``
(stdlib smtplib; no SMTP server exists in CI, so it is built lazily
and never imported on the evaluation path).
"""

from __future__ import annotations

import http.client
import time
import traceback
import urllib.error
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rfb_data_pipeline_spark.pipeline import manifest as mf

Transport = Callable[[str, str], None]  # (subject, body) -> delivered


@dataclass
class Alert:
    severity: str  # "success" | "failure"
    subject: str
    body: str


def failure_details(manifest: DataFrame) -> DataFrame:
    """One row per file with any non-success terminal stage: the
    WHERE (arquivo, first failed stage) and WHY (attempt count,
    count-gate numbers) of READme.md:34. Bounded output — the alert
    carries manifest rows, never table data."""
    stage_cols = [f"status_{s}" for s in mf.STAGES]
    first_failed = F.coalesce(
        *[
            F.when(F.col(c) == mf.FAILED, F.lit(s))
            for s, c in zip(mf.STAGES, stage_cols)
        ]
    )
    any_failed = None
    for c in stage_cols:
        cond = F.col(c) == mf.FAILED
        any_failed = cond if any_failed is None else (any_failed | cond)
    return (
        manifest.where(any_failed)
        .select(
            "arquivo",
            first_failed.alias("failed_stage"),
            "tentativas_download",
            F.col("validacoes.linhas_corrigidas").alias("linhas_corrigidas"),
            F.col("validacoes.registros_no_banco").alias("registros_no_banco"),
        )
        .orderBy("arquivo")
    )


def evaluate_run(manifest: DataFrame, ref_ym: str) -> Alert:
    """Success notification or detailed failure alert for a finished
    run — the READme.md:33-34 contract as data.

    Success requires EVERY file to have ``status_carga == SUCCESS``:
    a partially-progressed run with files still PENDING must not mail
    "todos os arquivos foram processados" (ADVICE r06)."""
    failures = failure_details(manifest).collect()  # bounded: files only
    tally = {
        r["status_carga"]: r["n_files"]
        for r in mf.status_report(manifest).collect()
    }
    n = sum(tally.values())
    # IGNORED is a TERMINAL non-failure state (run.py: a zip whose
    # members route to no table) — counting it as pending raised a
    # monthly false 'carga incompleta' alert and made the success
    # notification unreachable for any month with an unroutable zip
    # (r09 review).
    n_loaded = tally.get(mf.SUCCESS, 0) + tally.get(mf.IGNORED, 0)
    if n == 0:
        # An EMPTY manifest means discovery produced nothing for a
        # month the caller believed was loaded/loadable — mailing
        # "todos os 0 arquivos foram processados" as a SUCCESS buries
        # exactly the signal the alert exists to surface (r11 review;
        # unreachable via vigilante_once, whose publication probe
        # requires >0 zips, but evaluate_run is a library surface).
        return Alert(
            severity="failure",
            subject=f"[RFB {ref_ym}] ALERTA: manifesto vazio",
            body=(
                f"O manifesto do mes {ref_ym} nao contem nenhum "
                "arquivo: a descoberta nao encontrou zips ou o "
                "manifesto foi apagado."
            ),
        )
    if not failures and n_loaded < n:
        return Alert(
            severity="failure",
            subject=(
                f"[RFB {ref_ym}] ALERTA: carga incompleta "
                f"({n - n_loaded} de {n} arquivos pendentes)"
            ),
            body=(
                f"Nenhuma etapa falhou, mas {n - n_loaded} arquivo(s) do "
                f"mes {ref_ym} ainda nao chegaram a status_carga=sucesso.\n"
                f"Tally por status_carga: {tally}"
            ),
        )
    if not failures:
        return Alert(
            severity="success",
            subject=f"[RFB {ref_ym}] carga concluida com sucesso",
            body=(
                f"Todos os {n} arquivos do mes {ref_ym} foram processados; "
                "os dados estao prontos para uso.\n"
                f"Tally por status_carga: {tally}"
            ),
        )
    lines = [
        f"- {r['arquivo']}: falhou na etapa '{r['failed_stage']}' "
        f"(tentativas_download={r['tentativas_download']}, "
        f"linhas_corrigidas={r['linhas_corrigidas']}, "
        f"registros_no_banco={r['registros_no_banco']})"
        for r in failures
    ]
    return Alert(
        severity="failure",
        subject=(
            f"[RFB {ref_ym}] ALERTA: {len(failures)} arquivo(s) falharam"
        ),
        body="A pipeline parou nos seguintes pontos:\n" + "\n".join(lines),
    )


def notify(alert: Alert, transport: Transport) -> None:
    transport(alert.subject, alert.body)


def smtp_transport(
    host: str, port: int, sender: str, recipients: list[str]
) -> Transport:
    """Production transport over stdlib smtplib, built lazily so the
    evaluation path never needs a mail server."""

    def send(subject: str, body: str) -> None:
        import smtplib
        from email.message import EmailMessage

        msg = EmailMessage()
        msg["Subject"] = subject
        msg["From"] = sender
        msg["To"] = ", ".join(recipients)
        msg.set_content(body)
        with smtplib.SMTP(host, port) as s:
            s.send_message(msg)

    return send


# --------------------------------------------------------------------------
# Vigilante: the daily publication probe + trigger. The RFB publishes
# each reference month as a dated listing; "published" means the
# month's listing exists and contains zip links (the A1 discovery
# parse). State lives in the run's manifest directory — a month that
# already has a manifest is not re-triggered (resume within a month
# is run_month's own checkpoint lattice).


@dataclass
class VigilanteResult:
    ref_ym: str
    published: bool
    triggered: bool
    report: object = None
    alert: Alert | None = None


# Fetch failures that mean "the listing is not there (yet)": HTTP
# 404/5xx and transport errors from urllib's default_fetch, plus their
# file://-fetch equivalents in tests. Anything else (a parser
# regression, a misconfigured base_url raising ValueError, a typo'd
# fetch callable) is a BUG and must propagate — a bare except here made
# persistent errors indistinguishable from "not published", so the
# vigilante would silently probe forever (ADVICE r06).
_LISTING_ABSENT_ERRORS = (
    urllib.error.URLError,  # includes HTTPError
    # urlopen()/read() raise http.client.HTTPException subclasses
    # (BadStatusLine, IncompleteRead, RemoteDisconnected) on a flaky
    # server's malformed response; the probe runs outside vigilante
    # _once's run_month try/except, so without this entry one transient
    # bad response would kill the long-lived daily loop (ADVICE r07).
    http.client.HTTPException,
    ConnectionError,
    TimeoutError,
    FileNotFoundError,
)


def check_month_published(
    base_url: str, fetch: Callable[[str], str]
) -> bool:
    """True when the month's listing exists and lists zip files."""
    from rfb_data_pipeline_spark.pipeline.discovery import discover_files

    try:
        return len(discover_files(base_url, fetch=fetch)) > 0
    except _LISTING_ABSENT_ERRORS:  # 404s until the month is published
        return False


def vigilante_once(
    spark: SparkSession,
    cfg,
    transport: Transport,
    already_loaded: Callable[[str], bool],
) -> VigilanteResult:
    """One daily check (READme.md:8-9): probe the listing; when the
    month is published and not yet loaded, run the full month and
    send the success/failure notification (READme.md:33-34).

    run_month only records FAILED for anticipated failure modes
    (BadZipFile, count gate); an UNEXPECTED crash must still produce a
    failure alert — "the pipeline stopped" is precisely the scenario
    the README-promised alerting exists to report — and must not kill
    the daily loop (ADVICE r06)."""
    from rfb_data_pipeline_spark.pipeline.run import run_month

    if already_loaded(cfg.ref_ym):
        return VigilanteResult(cfg.ref_ym, published=True, triggered=False)
    if not check_month_published(cfg.base_url, cfg.fetch):
        return VigilanteResult(cfg.ref_ym, published=False, triggered=False)
    try:
        report = run_month(spark, cfg)
        manifest = mf.load_manifest(spark, report.manifest_path)
        alert = evaluate_run(manifest, cfg.ref_ym)
    except Exception as exc:  # noqa: BLE001 — alert, don't die
        alert = Alert(
            severity="failure",
            subject=(
                f"[RFB {cfg.ref_ym}] ALERTA: pipeline abortou com erro "
                f"inesperado ({type(exc).__name__})"
            ),
            body=(
                "A pipeline parou com uma excecao nao tratada antes de "
                "concluir o mes:\n"
                + "".join(traceback.format_exception(exc))
            ),
        )
        notify(alert, transport)
        return VigilanteResult(
            cfg.ref_ym, published=True, triggered=True, alert=alert
        )
    notify(alert, transport)
    return VigilanteResult(
        cfg.ref_ym, published=True, triggered=True, report=report, alert=alert
    )


def vigilante_daily(
    spark: SparkSession,
    cfg_for_month: Callable[[str], object],
    next_month: Callable[[], str],
    transport: Transport,
    already_loaded: Callable[[str], bool],
    interval_sec: float = 86400.0,
    max_checks: int | None = None,
    sleep: Callable[[float], None] = time.sleep,
) -> list[VigilanteResult]:
    """The daily loop, dependency-injected end to end (clock included)
    so tests drive it synchronously; production runs it as the
    long-lived driver process (or one cron'd ``vigilante_once`` per
    day, which is the same code path)."""
    results: list[VigilanteResult] = []
    checks = 0
    while max_checks is None or checks < max_checks:
        ref_ym = next_month()
        results.append(
            vigilante_once(spark, cfg_for_month(ref_ym), transport, already_loaded)
        )
        checks += 1
        if max_checks is not None and checks >= max_checks:
            break
        sleep(interval_sec)
    return results
