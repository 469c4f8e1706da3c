"""Raw→silver normalization for the all-string RFB layer.

The reference loads every column as text and never types it
(src/main.py:204); the README's "formatos de dados" contract
(READme.md:29) implies a typed layer. These builders produce it:

- empty-string → NULL (the all-string model's biggest cleanup),
- decimal-comma money → DECIMAL(38,2),
- yyyyMMdd strings → DATE (with the RFB's '0'/'00000000' null codes),
- comma-joined CNAE lists → ARRAY<STRING>,
- leading-zero restoration for CNPJ fragments.

All pure Catalyst expressions — the whole silver projection is one
WholeStageCodegen span over the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def empty_to_null(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.nullif(F.trim(c), F.lit(""))


def decimal_comma(col: str | Column, precision: int = 38, scale: int = 2) -> Column:
    """'1234,56' → DECIMAL; empty/malformed → NULL. try_cast, not
    cast: under ANSI (the session default) a plain cast RAISES on
    field-level junk like '12a,56' — which survives the column-count
    quarantine — and one bad cell aborted the month's load (r09
    review, reproduced)."""
    c = empty_to_null(col)
    return F.replace(c, F.lit(","), F.lit(".")).try_cast(
        f"decimal({precision},{scale})"
    )


def yyyymmdd(col: str | Column) -> Column:
    """RFB date strings → DATE; '0', '00000000', empty, and malformed
    values are NULL. try_to_date, not to_date: under ANSI a plain
    to_date RAISES on junk like '20230230' and aborted the whole
    silver write (r09 review, reproduced)."""
    c = empty_to_null(col)
    c = F.when(c.isin("0", "00000000"), F.lit(None)).otherwise(c)
    return F.try_to_date(c, "yyyyMMdd")


def code_list(col: str | Column) -> Column:
    """Comma-joined code list → ARRAY<STRING> (empty → empty array)."""
    c = empty_to_null(col)
    return F.when(c.isNull(), F.array().cast("array<string>")).otherwise(
        F.split(c, ",")
    )


def zero_pad(col: str | Column, width: int) -> Column:
    """Left-pad to ``width`` — but NEVER truncate: lpad silently cuts
    an overlong value to width, turning field-level junk into a
    syntactically valid key that joins to the WRONG row (r09 review).
    Overlong values pass through unpadded, where the v4 referential
    check surfaces them as orphans instead."""
    c = empty_to_null(col)
    return F.when(F.length(c) > width, c).otherwise(F.lpad(c, width, "0"))


def normalize_strings(df: DataFrame) -> DataFrame:
    """Apply empty→NULL to every string column (idempotent) — one
    select, not a withColumn-per-column loop (each withColumn stacks
    a nested Project; r09 review)."""
    return df.select(
        *[
            empty_to_null(f.name).alias(f.name)
            if f.dataType.typeName() == "string"
            else F.col(f.name)
            for f in df.schema.fields
        ]
    )


def empresas_silver(raw: DataFrame) -> DataFrame:
    return raw.select(
        zero_pad("cnpj_basico", 8).alias("cnpj_basico"),
        empty_to_null("razao_social").alias("razao_social"),
        empty_to_null("natureza_juridica").alias("natureza_juridica"),
        empty_to_null("qualificacao_responsavel").alias("qualificacao_responsavel"),
        decimal_comma("capital_social").alias("capital_social"),
        empty_to_null("porte").alias("porte"),
        empty_to_null("ente_federativo").alias("ente_federativo"),
    )


def estabelecimentos_silver(raw: DataFrame) -> DataFrame:
    passthrough_null = [
        "identificador_matriz_filial",
        "nome_fantasia",
        "situacao_cadastral",
        "motivo_situacao_cadastral",
        "nome_cidade_exterior",
        "pais",
        "cnae_fiscal_principal",
        "tipo_logradouro",
        "logradouro",
        "numero",
        "complemento",
        "bairro",
        "uf",
        "municipio",
        "ddd_1",
        "telefone_1",
        "ddd_2",
        "telefone_2",
        "ddd_fax",
        "fax",
        "correio_eletronico",
        "situacao_especial",
    ]
    return raw.select(
        zero_pad("cnpj_basico", 8).alias("cnpj_basico"),
        zero_pad("cnpj_ordem", 4).alias("cnpj_ordem"),
        zero_pad("cnpj_dv", 2).alias("cnpj_dv"),
        *[empty_to_null(c).alias(c) for c in passthrough_null],
        yyyymmdd("data_situacao_cadastral").alias("data_situacao_cadastral"),
        yyyymmdd("data_inicio_atividade").alias("data_inicio_atividade"),
        yyyymmdd("data_situacao_especial").alias("data_situacao_especial"),
        empty_to_null("cep").alias("cep"),
        code_list("cnae_fiscal_secundaria").alias("cnae_fiscal_secundaria"),
    )


def socios_silver(raw: DataFrame) -> DataFrame:
    cols = [
        c
        for c in raw.columns
        if c not in ("cnpj_basico", "data_entrada_sociedade")
    ]
    return raw.select(
        zero_pad("cnpj_basico", 8).alias("cnpj_basico"),
        *[empty_to_null(c).alias(c) for c in cols],
        yyyymmdd("data_entrada_sociedade").alias("data_entrada_sociedade"),
    )


def simples_silver(raw: DataFrame) -> DataFrame:
    date_cols = [c for c in raw.columns if c.startswith("data_")]
    other = [c for c in raw.columns if c not in date_cols and c != "cnpj_basico"]
    return raw.select(
        zero_pad("cnpj_basico", 8).alias("cnpj_basico"),
        *[empty_to_null(c).alias(c) for c in other],
        *[yyyymmdd(c).alias(c) for c in date_cols],
    )


def dimension_silver(raw: DataFrame) -> DataFrame:
    return raw.select(
        empty_to_null("codigo").alias("codigo"),
        empty_to_null("descricao").alias("descricao"),
    )


SILVER_BUILDERS = {
    "rfb_empresas": empresas_silver,
    "rfb_estabelecimentos": estabelecimentos_silver,
    "rfb_socios": socios_silver,
    "rfb_simples": simples_silver,
    "rfb_cnaes": dimension_silver,
    "rfb_motivos": dimension_silver,
    "rfb_municipios": dimension_silver,
    "rfb_naturezas": dimension_silver,
    "rfb_paises": dimension_silver,
    "rfb_qualificacoes": dimension_silver,
}


def to_silver(table: str, raw: DataFrame) -> DataFrame:
    return SILVER_BUILDERS[table](raw)
