"""RFB CNPJ table schemas (FIXTURES.md §A; reference src/main.py:166-171).

The raw layer is all-``StringType`` by design — the reference reads
every column as string to preserve leading zeros and survive malformed
numerics (reference src/main.py:204, ``dtype=str``). The typed silver
layer is produced by ``normalize.to_silver``.

Column layouts follow the public RFB CNPJ open-data dictionary; the
reference's CSVs are headerless so these schemas are positional.
"""

from __future__ import annotations

from pyspark.sql.types import StringType, StructField, StructType


def _string_schema(*cols: str) -> StructType:
    return StructType([StructField(c, StringType(), True) for c in cols])


EMPRESAS = _string_schema(
    "cnpj_basico",
    "razao_social",
    "natureza_juridica",
    "qualificacao_responsavel",
    "capital_social",
    "porte",
    "ente_federativo",
)

ESTABELECIMENTOS = _string_schema(
    "cnpj_basico",
    "cnpj_ordem",
    "cnpj_dv",
    "identificador_matriz_filial",
    "nome_fantasia",
    "situacao_cadastral",
    "data_situacao_cadastral",
    "motivo_situacao_cadastral",
    "nome_cidade_exterior",
    "pais",
    "data_inicio_atividade",
    "cnae_fiscal_principal",
    "cnae_fiscal_secundaria",
    "tipo_logradouro",
    "logradouro",
    "numero",
    "complemento",
    "bairro",
    "cep",
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
    "data_situacao_especial",
)

SOCIOS = _string_schema(
    "cnpj_basico",
    "identificador_socio",
    "nome_socio",
    "cnpj_cpf_socio",
    "qualificacao_socio",
    "data_entrada_sociedade",
    "pais",
    "representante_legal",
    "nome_representante",
    "qualificacao_representante",
    "faixa_etaria",
)

SIMPLES = _string_schema(
    "cnpj_basico",
    "opcao_simples",
    "data_opcao_simples",
    "data_exclusao_simples",
    "opcao_mei",
    "data_opcao_mei",
    "data_exclusao_mei",
)

_DIMENSION = _string_schema("codigo", "descricao")

# Routing map: filename suffix → (table name, schema). Mirrors the
# reference's mapa_tabelas (src/main.py:166-171), expressed as data so
# it can also feed a broadcast-join routing DataFrame (operator A15).
SUFFIX_TO_TABLE: dict[str, tuple[str, StructType]] = {
    "EMPRECSV": ("rfb_empresas", EMPRESAS),
    "ESTABELE": ("rfb_estabelecimentos", ESTABELECIMENTOS),
    "SOCIOCSV": ("rfb_socios", SOCIOS),
    "SIMPLES": ("rfb_simples", SIMPLES),
    "CNAECSV": ("rfb_cnaes", _DIMENSION),
    # The reference's mapa_tabelas (src/main.py:168-171) spells the
    # dimension suffixes MOTIV/MUNIC/NATJU/PAIS/QUALS; real drops have
    # shipped both spellings, so the router accepts either (round-2
    # ADVICE: spec-named files must not fall to 'ignorada').
    "MOTICSV": ("rfb_motivos", _DIMENSION),
    "MOTIV": ("rfb_motivos", _DIMENSION),
    "MUNICCSV": ("rfb_municipios", _DIMENSION),
    "MUNIC": ("rfb_municipios", _DIMENSION),
    "NATJUCSV": ("rfb_naturezas", _DIMENSION),
    "NATJU": ("rfb_naturezas", _DIMENSION),
    "PAISCSV": ("rfb_paises", _DIMENSION),
    "PAIS": ("rfb_paises", _DIMENSION),
    "QUALSCSV": ("rfb_qualificacoes", _DIMENSION),
    "QUALS": ("rfb_qualificacoes", _DIMENSION),
}

TABLE_SCHEMAS: dict[str, StructType] = {
    table: schema for table, schema in SUFFIX_TO_TABLE.values()
}

# Essential (never-null) columns per table — the README's promised
# null-check suite (reference READme.md:29), pinned here as data.
ESSENTIAL_COLUMNS: dict[str, list[str]] = {
    "rfb_empresas": ["cnpj_basico", "razao_social"],
    "rfb_estabelecimentos": ["cnpj_basico", "cnpj_ordem", "cnpj_dv"],
    "rfb_socios": ["cnpj_basico", "identificador_socio"],
    "rfb_simples": ["cnpj_basico"],
    "rfb_cnaes": ["codigo"],
    "rfb_motivos": ["codigo"],
    "rfb_municipios": ["codigo"],
    "rfb_naturezas": ["codigo"],
    "rfb_paises": ["codigo"],
    "rfb_qualificacoes": ["codigo"],
}

# Format constraints (README "formatos de dados", READme.md:29).
FORMAT_PATTERNS: dict[str, dict[str, str]] = {
    "rfb_empresas": {"cnpj_basico": r"^\d{8}$"},
    "rfb_estabelecimentos": {
        "cnpj_basico": r"^\d{8}$",
        "cnpj_ordem": r"^\d{4}$",
        "cnpj_dv": r"^\d{2}$",
        "uf": r"^[A-Z]{2}$",
        "cep": r"^\d{8}$",
    },
    "rfb_socios": {"cnpj_basico": r"^\d{8}$"},
    "rfb_simples": {"cnpj_basico": r"^\d{8}$"},
}
