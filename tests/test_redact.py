"""PII redaction: fixture-pinned (the synthetic documents corpus has
no PII, so a DuckDB oracle entry would pass vacuously — these tests
carry the verification instead).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rfb_data_pipeline_spark.functions.redact import redact, redaction_counts

FIXTURE = [
    # (raw, expected_redacted)
    (
        "contato: maria.silva+rh@empresa.com.br ou joao@x.io",
        "contato: <EMAIL> ou <EMAIL>",
    ),
    (
        "CNPJ 12.345.678/0001-95 e tambem 12345678000195",
        "CNPJ <CNPJ> e tambem <CNPJ>",
    ),
    ("CPF do socio: 123.456.789-09", "CPF do socio: <CPF>"),
    ("cpf bare 12345678909 fim", "cpf bare <CPF> fim"),
    ("ligue +55 (11) 98765-4321 agora", "ligue <PHONE> agora"),
    # ordinary numbers must SURVIVE (quality: don't eat the corpus)
    ("pedido 1234 custou 56.78 em 2024", "pedido 1234 custou 56.78 em 2024"),
    ("sem pii nenhum aqui", "sem pii nenhum aqui"),
]


def test_redact_fixture(spark):
    df = spark.createDataFrame([(a, b) for a, b in FIXTURE], ["raw", "expected"])
    got = df.select("expected", redact("raw").alias("got")).collect()
    for r in got:
        assert r.got == r.expected


def test_redaction_counts(spark):
    df = spark.createDataFrame(
        [("a@b.co visita 12.345.678/0001-95 e 123.456.789-09",)], ["raw"]
    )
    row = df.select(redaction_counts("raw").alias("c")).collect()[0].c
    assert row.n_email == 1
    assert row.n_cnpj == 1
    assert row.n_cpf == 1
    assert row.n_cnpj_bare == 0  # formatted CNPJ already consumed


def test_redact_is_jvm_only(spark):
    from rfb_data_pipeline_spark.plans import inspect as pi

    df = spark.createDataFrame([("x@y.zz",)], ["raw"]).select(
        redact("raw").alias("t")
    )
    assert not pi.has_python_eval(df)


def test_t13_audit_redacts_every_injected_class(spark):
    """t13's driver row is non-vacuous: each doc_id%4 class injects
    one PII instance and the audit finds at least that many across the
    corpus — per class, per language."""
    from rfb_data_pipeline_spark.operators.text import t13_pii_redaction

    rows = t13_pii_redaction(spark, "/root/testdata/sf0.001").collect()
    assert rows
    tot = {
        c: sum(r[c] for r in rows)
        for c in (
            "emails_redacted", "cnpjs_redacted", "cpfs_redacted",
            "phones_redacted",
        )
    }
    n_docs = sum(r["n_docs"] for r in rows)
    # every doc injects exactly one instance of its class; base text
    # may add more, never fewer
    assert tot["emails_redacted"] >= n_docs // 4
    assert tot["cnpjs_redacted"] >= n_docs // 4 - 1
    assert tot["cpfs_redacted"] >= n_docs // 4 - 1
    assert tot["phones_redacted"] >= n_docs // 4 - 1
    assert all(v > 0 for v in tot.values())
