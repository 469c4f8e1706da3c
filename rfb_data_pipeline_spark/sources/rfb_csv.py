"""RFB CSV source: semicolon-separated, headerless, all-string,
permissive (reference A8, src/main.py:204).

Differences from the reference, by design:
- No 50k-row driver-side chunking — Spark partitions the scan.
- PERMISSIVE mode with a ``_corrupt_record`` column replaces silent
  row breakage; the corrupt rows are first-class data for the
  validation suite (the README's "deslocamento de colunas" check,
  READme.md:29).
- Per-file encoding comes from the sniffer (sources.encoding) instead
  of a separate transcode pass — at scale the intermediate
  "__corrigido" file copy (src/main.py:145-148) is pure I/O waste.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from rfb_data_pipeline_spark.schemas import SUFFIX_TO_TABLE
from rfb_data_pipeline_spark.sources.encoding import to_spark_charset

CORRUPT_COL = "_corrupt_record"


def read_rfb_csv(
    spark: SparkSession,
    path: str | list[str],
    schema: StructType,
    encoding: str = "UTF-8",
) -> DataFrame:
    """Permissive headerless ';' CSV scan with explicit string schema.

    CSV column pruning is disabled: with pruning on, corrupt-row
    detection depends on which columns a query touches (a
    count-aggregate parses fewer fields than the write path and sees
    different corrupt rows — observed, not hypothetical). Column-shift
    detection (READme.md:29) must be projection-independent.
    """
    spark.conf.set("spark.sql.csv.parser.columnPruning.enabled", "false")
    full_schema = StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)]
    )
    return (
        spark.read.schema(full_schema)
        .option("sep", ";")
        .option("header", "false")
        .option("encoding", to_spark_charset(encoding))
        .option("quote", '"')
        .option("escape", '"')
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows_without_corrupt_col, corrupt_rows_full_width).

    The corrupt side keeps every column: Spark disallows queries that
    reference ONLY the internal corrupt-record column of a raw scan
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN).
    """
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull())
    return clean, bad


def scan_counts(df: DataFrame) -> tuple[int, int]:
    """(n_raw, n_corrupt) in a single scan-side aggregation. A real
    column is referenced alongside the corrupt column to satisfy the
    raw-scan restriction above."""
    first_col = next(c for c in df.columns if c != CORRUPT_COL)
    row = df.agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.count(CORRUPT_COL).alias("n_corrupt"),
        F.count(first_col).alias("_touch"),
    ).collect()[0]
    return row["n_raw"], row["n_corrupt"]


def route_table(filename_col: str = "filename") -> F.Column:
    """Filename → table-name routing expression (reference A15,
    src/main.py:166-171,186-194): strip the '__corrigido' marker, take
    the extension-ish suffix, upper-case, map via the routing table;
    unmatched → NULL (the 'ignorada' path).
    """
    base = F.element_at(F.split(F.col(filename_col), "__corrigido"), 1)
    suffix = F.upper(F.element_at(F.split(base, r"\."), -1))
    mapping = F.create_map(
        *[x for s, (t, _) in SUFFIX_TO_TABLE.items() for x in (F.lit(s), F.lit(t))]
    )
    return F.element_at(mapping, suffix)
