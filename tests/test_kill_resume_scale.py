"""§3.2 idempotence AT SCALE (VERDICT r07 item 7): a real SIGKILL in
the middle of fase_carga over an sf0.1-derived multi-part month, then
a resume, must land exactly the same silver partitions as an
uninterrupted run.

The killed run executes in its OWN subprocess/JVM: a watcher thread
SIGKILLs the process the moment the empresas write starts landing
files under the output table dir, so the crash leaves genuine partial
on-disk state (_temporary dirs / stray part files) and an UNSAVED
manifest — the worst §3.2 crash point. The resume then replays
download-skipped stages from the manifest and the dynamic partition
overwrite replaces the whole (table, ref_ym) partition atomically.

Fixture: sf0.1 orders (~150k rows) rendered as THREE Empresas CSV
parts + one Cnaes dimension zip — multi-part routing (Empresas0..2 →
one load) and a multi-table month, at a size where the load really
runs many tasks. Runtime budget <2 min.
"""

from __future__ import annotations

import os
import subprocess
import sys
import zipfile

import pandas as pd

from pyspark.sql import functions as F

from rfb_data_pipeline_spark.pipeline import manifest as mf
from rfb_data_pipeline_spark.pipeline.run import RunConfig, run_month

SF = "/root/testdata/sf0.1"


def _build_portal(tmp_path) -> str:
    """sf0.1 orders → 3 Empresas parts + Cnaes, zipped behind a
    file:// listing."""
    p = tmp_path / "portal"
    p.mkdir()
    orders = pd.read_parquet(
        os.path.join(SF, "orders.parquet"),
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"],
    )
    # empresas grammar: basico;"razao";natureza;qualificacao;"capital";porte;
    basico = orders["o_orderkey"].mod(10**8).map("{:08d}".format)
    razao = "EMPRESA " + orders["o_orderpriority"].str.replace(
        ";", ",", regex=False
    )
    capital = (
        orders["o_totalprice"]
        .map("{:.2f}".format)
        .str.replace(".", ",", regex=False)
    )
    lines = (
        basico
        + ';"' + razao + '";2062;49;"' + capital + '";03;'
    ).tolist()
    k = len(lines) // 3
    for part, chunk in enumerate((lines[:k], lines[k : 2 * k], lines[2 * k :])):
        with zipfile.ZipFile(p / f"Empresas{part}.zip", "w") as zf:
            zf.writestr(
                f"K{part:03d}.EMPRECSV",
                ("\n".join(chunk) + "\n").encode("latin-1"),
            )
    with zipfile.ZipFile(p / "Cnaes.zip", "w") as zf:
        zf.writestr(
            "K100.CNAECSV", "0111301;Cultivo de arroz\n4711302;Comercio\n"
        )
    (p / "index.html").write_text(
        "<html><body>"
        + "".join(
            f'<a href="{n}">{n}</a><br>'
            for n in ["Empresas0.zip", "Empresas1.zip", "Empresas2.zip",
                      "Cnaes.zip"]
        )
        + "</body></html>"
    )
    return str(p)


def _file_fetch(url: str) -> str:
    return open(url[len("file://"):], encoding="utf-8").read()


def _file_stream(url: str, dest: str) -> int:
    import shutil

    shutil.copyfile(url[len("file://"):], dest)
    return os.path.getsize(dest)


def _cfg(portal: str, work: str, out: str) -> RunConfig:
    return RunConfig(
        base_url=f"file://{portal}/index.html",
        work_dir=work,
        out_dir=out,
        ref_ym="202405",
        fetch=_file_fetch,
        stream=_file_stream,
    )


_KILLED_RUN = r"""
import os, signal, sys, threading, time
sys.path.insert(0, "/root/repo")
portal, work, out, tag = sys.argv[1:5]

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[8]")
    .appName("kill-resume-victim")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    # the tag lets the parent find (and wait out) the ORPHANED JVM:
    # SIGKILL below kills only this python process, and the JVM child
    # can keep running its in-flight write job for a while after
    .config("spark.driver.extraJavaOptions", f"-Dkillresume.tag={tag}")
    .getOrCreate()
)

emp_dir = os.path.join(out, "rfb_empresas")
def watcher():
    # SIGKILL the moment the empresas write starts touching disk —
    # a genuine mid-write crash, partial files left behind
    while True:
        if os.path.isdir(emp_dir):
            for root, _d, files in os.walk(emp_dir):
                if files:
                    os.kill(os.getpid(), signal.SIGKILL)
        time.sleep(0.02)

threading.Thread(target=watcher, daemon=True).start()

import tests.test_kill_resume_scale as k
from rfb_data_pipeline_spark.pipeline.run import run_month
run_month(spark, k._cfg(portal, work, out))
print("UNREACHABLE: run completed without being killed")
"""


def test_sigkill_mid_carga_then_resume_matches_uninterrupted(
    spark, tmp_path
):
    portal = _build_portal(tmp_path)

    # --- run A: uninterrupted reference run
    out_a = str(tmp_path / "silver_a")
    run_a = run_month(spark, _cfg(portal, str(tmp_path / "work_a"), out_a))
    assert run_a.passed

    # --- run B: subprocess killed mid-fase_carga, then in-process resume
    out_b = str(tmp_path / "silver_b")
    work_b = str(tmp_path / "work_b")
    tag = f"krs-{os.getpid()}-{os.path.basename(str(tmp_path))}"
    # generous timeout: under a concurrently-running full suite the
    # victim JVM can take minutes to boot before the kill can land
    # (raised 420->900 and the orphan wait 120->300 after a one-off
    # budget-exceeded flake in the r12 loaded full-suite run; both
    # budgets are pure waits, not semantics)
    proc = subprocess.run(
        [sys.executable, "-c", _KILLED_RUN, portal, work_b, out_b, tag],
        capture_output=True,
        text=True,
        timeout=900,
        env={**os.environ},
    )
    assert proc.returncode == -9, (
        f"victim exited {proc.returncode}, expected SIGKILL; "
        f"stdout={proc.stdout[-500:]!r}"
    )
    # the crash left mid-write debris and/or an unsaved manifest — the
    # scenario is only meaningful if the kill landed before completion
    assert "UNREACHABLE" not in proc.stdout
    # SIGKILL removed only the victim's PYTHON driver; its JVM child is
    # orphaned and can keep running the in-flight write for a while.
    # Wait for it to die before resuming, or two writers race on out_b
    # (the real-world analogue: fencing the old driver before retry).
    import time as _time

    deadline = _time.time() + 300
    while _time.time() < deadline:
        alive = subprocess.run(
            ["pgrep", "-f", f"killresume.tag={tag}"],
            capture_output=True, text=True,
        )
        if alive.returncode != 0:  # no matching process left
            break
        _time.sleep(0.25)
    else:
        raise AssertionError("victim JVM still alive after 300 s")

    resume = run_month(spark, _cfg(portal, work_b, out_b))
    assert resume.passed
    m = mf.load_manifest(spark, resume.manifest_path)
    assert all(r.status_carga == mf.SUCCESS for r in m.collect())

    # --- byte-level layout + data equality of the final partitions
    for table in ("rfb_empresas", "rfb_cnaes"):
        pa = os.path.join(out_a, table)
        pb = os.path.join(out_b, table)
        parts_a = sorted(
            d for d in os.listdir(pa) if d.startswith("ref_ym=")
        )
        parts_b = sorted(
            d for d in os.listdir(pb) if d.startswith("ref_ym=")
        )
        assert parts_a == parts_b == ["ref_ym=202405"]
        da, db = spark.read.parquet(pa), spark.read.parquet(pb)
        assert da.schema == db.schema
        cols = [F.col(c).cast("string") for c in da.columns]
        chk = lambda df: df.agg(  # noqa: E731
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("chk"),
        ).collect()[0]
        ra, rb = chk(da), chk(db)
        assert ra["n"] == rb["n"] and ra["chk"] == rb["chk"], table
        # no writer debris survives the resume overwrite
        for root, dirs, _files in os.walk(pb):
            assert "_temporary" not in dirs, root
    # multi-part routing really happened: empresas carries all 3 parts
    emp_n = spark.read.parquet(os.path.join(out_b, "rfb_empresas")).count()
    assert emp_n >= 140_000
