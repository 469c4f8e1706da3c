"""Monthly-run orchestrator: the reference's full lifecycle
(§3.1 plan → download → extract → correct → load → report) with the
§3.2 resume semantics, on Spark.

Stage-by-stage, each selecting its work from the manifest with the
reference's status lattice (src/main.py:82,108,125,183), completing
with a manifest update, persisted once per stage (the reference saves
after every single mutation — src/main.py:103,120,162,220 — which at
37 files/month is pure overhead; per-stage persistence gives the same
crash-resume granularity the status lattice can actually express).

Self-heal: a corrupt archive at the extract stage resets its
status_download to 'pendente' (reference src/main.py:116-119), so the
next run re-downloads it.

The correct+load stages collapse into one distributed pass
(read CSV with the sniffed encoding → silver → partitioned parquet):
the reference's intermediate '__corrigido' file copy exists only to
feed pandas a clean UTF-8 file, which the Spark reader does not need.
"""

from __future__ import annotations

import os
import zipfile
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from rfb_data_pipeline_spark.pipeline import manifest as mf
from rfb_data_pipeline_spark.pipeline.discovery import default_fetch, discover_files
from rfb_data_pipeline_spark.pipeline.download import (
    default_stream,
    download_pending,
)
from rfb_data_pipeline_spark.pipeline.ingest import LoadResult, load_table
from rfb_data_pipeline_spark.sources.encoding import sniff_encoding
from rfb_data_pipeline_spark.sources.rfb_csv import route_table_py


@dataclass
class RunConfig:
    base_url: str
    work_dir: str
    out_dir: str
    ref_ym: str
    fetch: Callable[[str], str] = default_fetch
    stream: Callable[[str, str], int] = default_stream
    backoff_sec: float = 0.0  # reference uses 5 s; tests want 0


@dataclass
class RunReport:
    loads: list[LoadResult] = field(default_factory=list)
    manifest_path: str = ""
    # files whose download/extract has not succeeded when the load
    # stage came up — the tables they feed are HELD (not loaded, their
    # contributing files left pending) rather than risking a partial
    # (table, ref_ym) overwrite; alerting reports the incompleteness
    held_for: list[str] = field(default_factory=list)

    @property
    def passed(self) -> bool:
        return all(lr.passed for lr in self.loads)


def _route_one(filename: str) -> str | None:
    return route_table_py(filename)


def _zip_expected_table(zip_name: str) -> str | None:
    """Table a portal zip is expected to feed, from its name stem
    (``Empresas3.zip`` → ``rfb_empresas``) — the dados-abertos naming
    contract. None for unrecognized names (callers treat that
    conservatively)."""
    import re

    from rfb_data_pipeline_spark.schemas import TABLE_SCHEMAS

    stem = re.sub(r"\d+$", "", zip_name.rsplit(".", 1)[0]).lower()
    t = f"rfb_{stem}"
    return t if t in TABLE_SCHEMAS else None


def run_month(spark: SparkSession, cfg: RunConfig) -> RunReport:
    os.makedirs(cfg.work_dir, exist_ok=True)
    zips_dir = os.path.join(cfg.work_dir, "zips")
    extract_dir = os.path.join(cfg.work_dir, "extracted")
    os.makedirs(zips_dir, exist_ok=True)
    os.makedirs(extract_dir, exist_ok=True)
    manifest_path = os.path.join(cfg.work_dir, f"manifesto_{cfg.ref_ym}.json")

    # ---- plan (A1; resume short-circuits like src/main.py:51-53)
    if os.path.exists(manifest_path):
        manifest = mf.load_manifest(spark, manifest_path)
    else:
        manifest = mf.new_manifest(spark, discover_files(cfg.base_url, cfg.fetch))

    # ---- download (A2/A21)
    todo = [
        (r.arquivo, r.url, os.path.join(zips_dir, r.arquivo))
        for r in mf.pending_for_stage(manifest, "download").collect()
    ]
    if todo:
        results = download_pending(todo, stream=cfg.stream, backoff_sec=cfg.backoff_sec)
        updates = spark.createDataFrame(
            [
                (
                    r["arquivo"],
                    mf.SUCCESS if r["ok"] else mf.FAILED,
                    r["attempts"],
                    r["caminho_zip"],
                )
                for r in results
            ],
            "arquivo string, new_status_download string, "
            "new_tentativas_download int, new_caminho_zip string",
        )
        manifest = mf.apply_updates(manifest, updates)
        mf.save_manifest(manifest, manifest_path)

    # ---- extract (A3, with BadZipFile self-heal)
    updates_rows = []
    for r in mf.pending_for_stage(manifest, "extracao").collect():
        try:
            with zipfile.ZipFile(r.caminho_zip) as zf:
                members = [m for m in zf.namelist() if not m.endswith("/")]
                zf.extractall(extract_dir)
            updates_rows.append((r.arquivo, mf.SUCCESS, mf.PENDING, members))
        except (zipfile.BadZipFile, OSError):
            # self-heal: reopen the download stage (src/main.py:116-119).
            # OSError covers the zip VANISHING between runs (a crash
            # after the per-row os.remove but before the stage's
            # manifest save left caminho_zip dangling — r09 review:
            # FileNotFoundError used to abort run_month on every
            # resume until the manifest was hand-edited)
            if r.caminho_zip and os.path.exists(r.caminho_zip):
                os.remove(r.caminho_zip)
            updates_rows.append((r.arquivo, mf.PENDING, mf.PENDING, None))
    if updates_rows:
        updates = spark.createDataFrame(
            [
                (a, None if st == mf.PENDING else st, st2, m, st)
                for a, st, st2, m in updates_rows
            ],
            "arquivo string, new_status_extracao string, "
            "new_status_correcao string, new_arquivos_extraidos array<string>, "
            "new_status_download string",
        )
        # note: new_status_download only set for the self-heal rows
        heal = updates.filter("new_status_extracao is null").selectExpr(
            "arquivo", "'pendente' as new_status_download",
            "'pendente' as new_status_extracao",
        )
        ok = updates.filter("new_status_extracao is not null").drop(
            "new_status_download"
        )
        manifest = mf.apply_updates(manifest, ok)
        if heal.count() > 0:
            # a fresh download must re-run; FAILED would stop the lattice
            manifest = mf.apply_updates(manifest, heal)
        mf.save_manifest(manifest, manifest_path)

    # ---- correct + load (A4-A13, A15) — grouped by ROUTED TABLE, not
    # by file: real months ship multi-part tables (Empresas0..9 all
    # route to rfb_empresas) and load_table's atomic partition
    # overwrite replaces the whole (table, ref_ym) partition, so each
    # table must load exactly once per month with every part in one
    # csv_paths list (round-2 ADVICE, high — the reference has the
    # same TRUNCATE-per-file quirk at src/main.py:200; we fix it).
    report = RunReport(manifest_path=manifest_path)
    pending = mf.pending_for_stage(manifest, "correcao").collect()
    # Completeness gate (r09 review): a file that has not extracted
    # has unknown members, and load_table's atomic partition overwrite
    # demands EVERY part of a table in one call — loading around a
    # failed Empresas3.zip would silently ship a 90%-complete
    # rfb_empresas partition marked sucesso. The portal's naming
    # contract identifies each zip's table (Empresas3.zip →
    # rfb_empresas), so only the AFFECTED tables are held (their
    # contributing files stay pending for the resume); an
    # unrecognizable zip name conservatively holds everything.
    held_tables: set[str] = set()
    hold_all = False
    incomplete_files = []
    for r in manifest.collect():
        if r.status_extracao == mf.SUCCESS:
            continue
        incomplete_files.append(r.arquivo)
        t = _zip_expected_table(r.arquivo)
        if t is None:
            hold_all = True
        else:
            held_tables.add(t)
    if pending and incomplete_files:
        report.held_for = sorted(incomplete_files)
    # Group by routed table over ALL extracted files — not only the
    # correcao-pending ones: on a resume where one part's zip was
    # reset and re-done, the table must still re-load with its
    # already-loaded sibling parts in the same csv_paths list, or the
    # partition overwrite would clobber them (r09 review).
    zip_tables: dict[str, set[str | None]] = {}
    table_inputs: dict[str, list[str]] = {}
    table_encodings: dict[str, dict[str, str]] = {}
    pending_names = {r.arquivo for r in pending}
    tables_to_load: set[str] = set()
    member_owner: dict[str, str] = {}
    for r in manifest.collect() if pending else []:
        if r.status_extracao != mf.SUCCESS:
            continue
        zip_tables[r.arquivo] = set()
        for member in r.arquivos_extraidos or []:
            path = os.path.join(extract_dir, member)
            table = _route_one(member)
            zip_tables[r.arquivo].add(table)
            if table is None:
                # An unroutable member (readme/layout file) never
                # feeds csv_paths, so a cross-zip name collision on it
                # cannot double-count rows — not worth aborting the
                # month over (ADVICE r11). It still can't claim
                # ownership of a loadable name, so skip before the
                # owner bookkeeping.
                continue
            # ROUTABLE member names must be UNIQUE across the month:
            # every zip extracts into one shared dir, so a repeated
            # name means the extracted file's content is whichever zip
            # ran last — and the repeated path would ride csv_paths
            # twice, double-reading its rows past the count gate
            # (which compares two counts of the same doubled scan).
            # Silent data corruption either way: fail loud (r11
            # review; the real portal's member names are unique by
            # contract).
            owner = member_owner.setdefault(member, r.arquivo)
            if owner != r.arquivo:
                raise RuntimeError(
                    f"extracted member name collision: {member!r} is "
                    f"claimed by both {owner!r} and {r.arquivo!r} — the "
                    "shared extract dir holds only one of the two "
                    "files, and loading it twice would double its "
                    "rows. The month's drop violates the unique-name "
                    "contract; inspect the portal listing."
                )
            if path in table_inputs.get(table, ()):  # same zip listed
                # the member twice (duplicate entries in one archive:
                # extractall kept one file; counting it once is the
                # only consistent reading)
                continue
            table_inputs.setdefault(table, []).append(path)
            table_encodings.setdefault(table, {})[path] = sniff_encoding(path)
            if r.arquivo in pending_names:
                tables_to_load.add(table)

    if hold_all:
        tables_to_load = set()
    else:
        tables_to_load -= held_tables

    table_passed: dict[str, bool] = {}
    for table in sorted(tables_to_load):
        lr = load_table(
            spark,
            table,
            table_inputs[table],
            cfg.out_dir,
            ref_ym=cfg.ref_ym,
            encoding=table_encodings[table],
        )
        report.loads.append(lr)
        table_passed[table] = lr.passed

    if pending:
        rows = []
        for r in pending:
            tables = zip_tables[r.arquivo]
            routed = {t for t in tables if t is not None}
            if routed and not routed <= set(table_passed):
                # routes to a HELD table: this run did not load it, so
                # the file stays pending for the resume
                continue
            if routed and any(not table_passed[t] for t in routed):
                final = mf.FAILED
            elif not routed and tables:
                final = mf.IGNORED
            else:
                final = mf.SUCCESS
            rows.append((r.arquivo, mf.SUCCESS, final))
        updates = spark.createDataFrame(
            rows,
            "arquivo string, new_status_correcao string, new_status_carga string",
        )
        manifest = mf.apply_updates(manifest, updates)
        mf.save_manifest(manifest, manifest_path)

    return report


def final_report(spark: SparkSession, manifest_path: str) -> DataFrame:
    """The A16 tally as a DataFrame (print-side effects belong to the
    caller, not the engine — READme.md:33-34's e-mail hook)."""
    return mf.status_report(mf.load_manifest(spark, manifest_path))
