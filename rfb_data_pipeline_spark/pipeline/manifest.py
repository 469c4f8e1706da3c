"""Manifest: the pipeline-state table (reference A19, src/main.py:29-77).

The reference keeps a JSON dict keyed by filename with a 4-stage
status machine (download → extracao → correcao → carga) persisted
after every mutation. Here the manifest is a small typed DataFrame
persisted as JSON; each stage selects its work with the same status
predicates (A14) and completes by an idempotent overwrite of the
manifest file. Crash-resume = reload + re-filter, exactly the
reference's semantics (§3.2) without per-mutation file writes.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

PENDING = "pendente"
SUCCESS = "sucesso"
FAILED = "falhou"
IGNORED = "ignorada"

STAGES = ("download", "extracao", "correcao", "carga")

MANIFEST_SCHEMA = StructType(
    [
        StructField("arquivo", StringType(), False),
        StructField("url", StringType(), True),
        StructField("status_download", StringType(), False),
        StructField("status_extracao", StringType(), False),
        StructField("status_correcao", StringType(), False),
        StructField("status_carga", StringType(), False),
        StructField("tentativas_download", IntegerType(), False),
        StructField("caminho_zip", StringType(), True),
        StructField("arquivos_extraidos", ArrayType(StringType()), True),
        StructField(
            "validacoes",
            StructType(
                [
                    StructField("linhas_originais", LongType(), True),
                    StructField("linhas_corrigidas", LongType(), True),
                    StructField("registros_no_banco", LongType(), True),
                ]
            ),
            True,
        ),
    ]
)


def new_manifest(spark: SparkSession, files: list[tuple[str, str]]) -> DataFrame:
    """Fresh manifest from (arquivo, url) pairs — all stages pending
    (reference src/main.py:62-71)."""
    rows = [
        (
            arquivo,
            url,
            PENDING,
            PENDING,
            PENDING,
            PENDING,
            0,
            None,
            [],
            (None, None, None),
        )
        for arquivo, url in files
    ]
    return spark.createDataFrame(rows, MANIFEST_SCHEMA)


def pending_for_stage(manifest: DataFrame, stage: str) -> DataFrame:
    """Work selection per stage — the reference's status lattice
    (src/main.py:82,108,125,183): a stage runs when it is pending and
    every earlier stage succeeded.
    """
    if stage not in STAGES:
        raise ValueError(f"unknown stage {stage!r}")
    cond = F.col(f"status_{stage}") == PENDING
    for earlier in STAGES[: STAGES.index(stage)]:
        cond &= F.col(f"status_{earlier}") == SUCCESS
    return manifest.filter(cond)


def apply_updates(manifest: DataFrame, updates: DataFrame) -> DataFrame:
    """Merge per-file updates (keyed by ``arquivo``) into the manifest;
    update columns win via coalesce. ``updates`` carries ``arquivo``
    plus any subset of manifest columns prefixed ``new_``.
    """
    joined = manifest.join(updates, "arquivo", "left")
    out_cols = []
    for f in MANIFEST_SCHEMA.fields:
        if f.name == "arquivo":
            out_cols.append(F.col("arquivo"))
        elif f"new_{f.name}" in updates.columns:
            out_cols.append(
                F.coalesce(F.col(f"new_{f.name}"), F.col(f.name)).alias(f.name)
            )
        else:
            out_cols.append(F.col(f.name))
    return joined.select(*out_cols)


def save_manifest(manifest: DataFrame, path: str) -> None:
    """Atomic single-file JSON save (the manifest is driver-scale:
    ~37 rows/month — a distributed write would be overhead).

    Control-plane cap: this collect() is bounded by the file count of
    one monthly drop (tens of rows), never by data volume. If a future
    source produced manifests beyond ~10^5 rows, switch to a
    partitioned parquet/Delta manifest and per-stage predicate updates
    instead of whole-frame round-trips."""
    records = [r.asDict(recursive=True) for r in manifest.collect()]
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    with os.fdopen(fd, "w", encoding="utf-8") as f:
        json.dump(records, f, ensure_ascii=False, indent=1)
    os.replace(tmp, path)


def load_manifest(spark: SparkSession, path: str) -> DataFrame:
    with open(path, encoding="utf-8") as f:
        records = json.load(f)
    val_fields = [
        f.name
        for f in MANIFEST_SCHEMA["validacoes"].dataType.fields  # type: ignore[union-attr]
    ]
    rows = [
        tuple(
            # look the struct fields up BY NAME: dict.values() depends
            # on JSON key order, so a hand-edited or key-sorted
            # manifest would silently load the counts into the wrong
            # slots (r09 review)
            tuple(rec[name].get(f) for f in val_fields)
            if name == "validacoes" and rec[name] is not None
            else rec[name]
            for name in MANIFEST_SCHEMA.fieldNames()
        )
        for rec in records
    ]
    return spark.createDataFrame(rows, MANIFEST_SCHEMA)


def load_or_create(
    spark: SparkSession, path: str, files: list[tuple[str, str]]
) -> DataFrame:
    """Resume semantics (reference src/main.py:51-53): reuse the
    existing manifest if present, else plan a fresh one."""
    if os.path.exists(path):
        return load_manifest(spark, path)
    return new_manifest(spark, files)


def status_report(manifest: DataFrame) -> DataFrame:
    """Final tally (reference A16, src/main.py:222-237) as a DataFrame."""
    return manifest.groupBy("status_carga").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.collect_list(F.when(F.col("status_carga") != SUCCESS, F.col("arquivo"))).alias(
            "files"
        ),
    )
