"""Reference-faithful pipeline tests (SURVEY.md §5 items 2-4):
encodings, corrupt rows, validations, idempotent re-runs, zip source,
manifest resume semantics, CNPJ check digits.
"""

from __future__ import annotations

import os
import zipfile

import pytest
from pyspark.sql import functions as F

from rfb_data_pipeline_spark.functions.cnpj import (
    cnpj14,
    cnpj_is_valid,
    compute_check_digits,
)
from rfb_data_pipeline_spark.pipeline import manifest as mf
from rfb_data_pipeline_spark.pipeline.ingest import load_table
from rfb_data_pipeline_spark.pipeline.validate import (
    v4_referential,
    v5_duplicate_keys,
)
from rfb_data_pipeline_spark.schemas import EMPRESAS
from rfb_data_pipeline_spark.sources.encoding import (
    count_lines,
    sniff_encoding,
    transcode_file,
)
from rfb_data_pipeline_spark.sources.rfb_csv import read_rfb_csv, route_table
from rfb_data_pipeline_spark.sources.zip_source import (
    list_zip_members,
    read_zip_lines,
)

# 10 rows of empresas-shaped data; includes accents, an empty capital,
# decimal commas, and a leading-zero CNPJ.
EMPRESAS_ROWS = [
    '00000001;"AÇÃO COMÉRCIO LTDA";2062;49;"1234,56";03;',
    '12345678;"SÃO PAULO TRANSPORTES SA";2046;49;"1000000,00";05;',
    '00000002;"PADARIA PÃO QUENTE ME";2135;50;"0,00";01;',
    "00000003;EMPRESA SEM ACENTO;2062;49;;01;",
]


@pytest.fixture()
def rfb_dir(tmp_path):
    d = tmp_path / "rfb"
    d.mkdir()
    latin = d / "K001.EMPRECSV.csv"
    latin.write_bytes(("\n".join(EMPRESAS_ROWS) + "\n").encode("latin-1"))
    bom = d / "K002.EMPRECSV.csv"
    bom.write_bytes(
        ("﻿" + EMPRESAS_ROWS[0] + "\n").encode("utf-8")
    )
    return d


def test_sniff_encoding(rfb_dir, tmp_path):
    assert sniff_encoding(str(rfb_dir / "K001.EMPRECSV.csv")) == "latin-1"
    assert sniff_encoding(str(rfb_dir / "K002.EMPRECSV.csv")) == "utf-8-sig"
    plain = tmp_path / "plain.csv"
    plain.write_text("abc;def\n", encoding="utf-8")
    assert sniff_encoding(str(plain)) == "utf-8"


def test_transcode_errors_replace(rfb_dir, tmp_path):
    src = str(rfb_dir / "K001.EMPRECSV.csv")
    dst = str(tmp_path / "K001__corrigido.csv")
    lines_in, lines_out = transcode_file(src, dst)
    assert lines_in == lines_out == 4  # A7 gate
    assert count_lines(dst) == 4
    text = open(dst, encoding="utf-8").read()
    assert "AÇÃO COMÉRCIO" in text  # latin-1 → utf-8 preserved accents


def test_read_rfb_csv_encoding_and_types(spark, rfb_dir):
    df = read_rfb_csv(
        spark, str(rfb_dir / "K001.EMPRECSV.csv"), EMPRESAS, encoding="latin-1"
    )
    rows = {r.cnpj_basico: r for r in df.collect()}
    assert rows["00000001"].razao_social == "AÇÃO COMÉRCIO LTDA"
    # leading zeros preserved (all-string schema)
    assert set(rows) == {"00000001", "12345678", "00000002", "00000003"}


def test_route_table(spark):
    df = spark.createDataFrame(
        [
            ("K3241.K03200Y0.D50510.EMPRECSV",),
            ("K3241.K03200Y0.D50510.ESTABELE__corrigido.csv",),
            ("weird.UNKNOWN",),
        ],
        ["filename"],
    )
    got = df.select(route_table().alias("t")).collect()
    # reference semantics (src/main.py:186-190): strip '__corrigido'
    # and everything after it FIRST, then route on the last dot-suffix.
    assert [r.t for r in got] == ["rfb_empresas", "rfb_estabelecimentos", None]


def test_load_table_end_to_end_idempotent(spark, rfb_dir, tmp_path):
    out = str(tmp_path / "silver")
    res = load_table(
        spark,
        "rfb_empresas",
        str(rfb_dir / "K001.EMPRECSV.csv"),
        out,
        ref_ym="202405",
        encoding="latin-1",
        keys=["cnpj_basico"],
    )
    assert res.passed, res
    assert res.n_written == 4 and res.n_corrupt == 0

    df = spark.read.parquet(f"{out}/rfb_empresas")
    got = {r.cnpj_basico: r for r in df.collect()}
    # typed silver: decimal cast with comma→dot, empty→null
    assert str(got["00000001"].capital_social) == "1234.56"
    assert got["00000003"].capital_social is None
    assert got["00000003"].ente_federativo is None  # empty → NULL

    # idempotence: second run overwrites the same partition, not appends
    res2 = load_table(
        spark,
        "rfb_empresas",
        str(rfb_dir / "K001.EMPRECSV.csv"),
        out,
        ref_ym="202405",
        encoding="latin-1",
    )
    assert res2.passed
    assert spark.read.parquet(f"{out}/rfb_empresas").count() == 4

    # a second month lands in its own partition
    load_table(
        spark,
        "rfb_empresas",
        str(rfb_dir / "K001.EMPRECSV.csv"),
        out,
        ref_ym="202406",
        encoding="latin-1",
    )
    both = spark.read.parquet(f"{out}/rfb_empresas")
    assert both.count() == 8
    assert both.select("ref_ym").distinct().count() == 2


def test_corrupt_rows_quarantined(spark, tmp_path):
    bad = tmp_path / "bad.EMPRECSV.csv"
    bad.write_text(
        "00000001;OK LTDA;2062;49;100,00;03;\n"
        "shifted;row;with;far;too;many;fields;extra1;extra2;extra3\n",
        encoding="utf-8",
    )
    res = load_table(
        spark, "rfb_empresas", str(bad), str(tmp_path / "s2"), ref_ym="202405"
    )
    assert res.n_corrupt == 1 and res.n_written == 1
    assert res.passed
    # corrupt rows are quarantined for inspection, not dropped
    q = spark.read.parquet(str(tmp_path / "s2" / "_quarantine" / "rfb_empresas"))
    assert q.count() == 1
    assert "shifted;row" in q.first()._corrupt_record


def test_validations_catch_orphans_and_dups(spark):
    emp = spark.createDataFrame(
        [("00000001",), ("00000002",)], ["cnpj_basico"]
    )
    est = spark.createDataFrame(
        [("00000001", "0001"), ("00000001", "0001"), ("99999999", "0001")],
        ["cnpj_basico", "cnpj_ordem"],
    )
    orphans = v4_referential(est, emp, "cnpj_basico", "cnpj_basico").collect()
    assert [(r.orphan_key, r.n_rows) for r in orphans] == [("99999999", 1)]
    dups = v5_duplicate_keys(est, ["cnpj_basico", "cnpj_ordem"]).collect()
    assert [(r.cnpj_basico, r.n_copies) for r in dups] == [("00000001", 2)]


def test_zip_source_and_self_heal(spark, tmp_path):
    zdir = tmp_path / "zips"
    zdir.mkdir()
    good = zdir / "Empresas0.zip"
    with zipfile.ZipFile(good, "w") as zf:
        zf.writestr("K001.EMPRECSV", "\n".join(EMPRESAS_ROWS[:2]) + "\n")
    bad = zdir / "Empresas1.zip"
    bad.write_bytes(b"this is not a zip file")

    members = list_zip_members(spark, str(zdir) + "/*.zip").collect()
    by_archive = {os.path.basename(m.archive): m for m in members}
    assert by_archive["Empresas0.zip"].member == "K001.EMPRECSV"
    assert by_archive["Empresas1.zip"].error is not None  # self-heal signal

    lines = read_zip_lines(spark, str(zdir) + "/*.zip").collect()
    assert len(lines) == 2
    assert all(os.path.basename(ln.archive) == "Empresas0.zip" for ln in lines)


def test_manifest_stage_lattice_and_resume(spark, tmp_path):
    m = mf.new_manifest(
        spark, [("Empresas0.zip", "http://x/e0.zip"), ("Socios0.zip", "http://x/s0.zip")]
    )
    assert mf.pending_for_stage(m, "download").count() == 2
    assert mf.pending_for_stage(m, "extracao").count() == 0  # gated on download

    updates = spark.createDataFrame(
        [("Empresas0.zip", mf.SUCCESS)], ["arquivo", "new_status_download"]
    )
    m2 = mf.apply_updates(m, updates)
    assert mf.pending_for_stage(m2, "extracao").count() == 1
    assert mf.pending_for_stage(m2, "download").count() == 1

    path = str(tmp_path / "manifest.json")
    mf.save_manifest(m2, path)
    m3 = mf.load_or_create(spark, path, files=[])
    assert m3.count() == 2
    got = {r.arquivo: r.status_download for r in m3.collect()}
    assert got == {"Empresas0.zip": mf.SUCCESS, "Socios0.zip": mf.PENDING}


def test_cnpj_check_digits(spark):
    # 00.000.000/0001-91 (Banco do Brasil) is the canonical example.
    df = spark.createDataFrame(
        [("00000000", "0001", "91"), ("12345678", "0001", "00")],
        ["b", "o", "d"],
    )
    out = df.select(
        cnpj14("b", "o", "d").alias("cnpj"),
        cnpj_is_valid(cnpj14("b", "o", "d")).alias("ok"),
        compute_check_digits(F.concat(F.col("b"), F.col("o"))).alias("dv"),
    ).collect()
    assert out[0].cnpj == "00000000000191"
    assert out[0].ok is True
    assert out[0].dv == "91"
    assert out[1].ok is False  # wrong check digits
