"""Source/sink format coverage beyond parquet: ORC, JSON-lines, and
CSV round-trips must preserve rows and types (or document exactly
where a format is lossy and how the reader recovers the schema).

The reference ingests `;`-separated CSV only (src/main.py:141-158);
a general engine additionally needs the columnar (ORC) and log-style
(JSON-lines) formats — both built into Spark, no extra deps.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rfb_data_pipeline_spark.catalog import load_tables
from tests.conftest import SF_SMALL


def _nation(spark):
    return load_tables(spark, SF_SMALL, tables=("nation",), register_views=False)[
        "nation"
    ]


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_orc_roundtrip_exact(spark, tmp_path):
    src = _nation(spark)
    out = str(tmp_path / "nation_orc")
    src.write.orc(out)
    back = spark.read.orc(out)
    assert back.schema == src.schema  # ORC is typed: schema survives
    assert _sorted_rows(back) == _sorted_rows(src)


def test_json_lines_roundtrip_with_schema(spark, tmp_path):
    src = _nation(spark)
    out = str(tmp_path / "nation_json")
    src.write.json(out)
    # JSON is schemaless on disk — reading WITH the declared schema
    # restores exact types; schema inference alone would widen ints.
    back = spark.read.schema(src.schema).json(out)
    assert back.schema == src.schema
    assert _sorted_rows(back) == _sorted_rows(src)


def test_csv_roundtrip_with_schema(spark, tmp_path):
    src = _nation(spark)
    out = str(tmp_path / "nation_csv")
    src.write.option("header", True).csv(out)
    back = spark.read.option("header", True).schema(src.schema).csv(out)
    assert back.schema == src.schema
    assert _sorted_rows(back) == _sorted_rows(src)


def test_orc_predicate_pushdown(spark, tmp_path):
    """The scan contract holds across formats: ORC scans push filters
    down just like parquet (the 100 TB reason to stay columnar)."""
    src = _nation(spark)
    out = str(tmp_path / "nation_orc_pd")
    src.write.orc(out)
    df = spark.read.orc(out).filter(F.col("n_regionkey") == 1).select("n_name")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "n_regionkey" in plan.split("PushedFilters:")[1][:200]
