"""Validation suite V1-V5 (SURVEY.md §5; READme.md:27-30 contract).

The reference only ever checks COUNT(*) equality (src/main.py:153-158,
207-216); the README promises null checks, format checks, column-shift
detection, and rollback. Each check here is a reusable query builder
returning a violations DataFrame (empty == pass), so callers compose
them into a report or a gate.

Scale: every check is a single scan-side aggregate or anti-join; none
collects row-level data to the driver beyond the violation summary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rfb_data_pipeline_spark.schemas import ESSENTIAL_COLUMNS, FORMAT_PATTERNS


def v1_count_reconciliation(
    expected: int, actual: int, label: str = ""
) -> dict[str, object]:
    """A7/A13 count-equality gate as data (both counts come from
    Observation metrics or df.count())."""
    return {
        "check": "count_reconciliation",
        "label": label,
        "expected": expected,
        "actual": actual,
        "passed": expected == actual,
    }


def v2_null_essentials(df: DataFrame, table: str) -> DataFrame:
    """Null-rate on essential columns (READme.md:29). One aggregate
    row per column with its null count; violations = rows with
    n_null > 0."""
    cols = ESSENTIAL_COLUMNS.get(table, [])
    aggs = [
        F.sum(F.col(c).isNull().cast("long")).alias(c) for c in cols
    ]
    if not aggs:
        return df.sparkSession.createDataFrame([], "column string, n_null long")
    wide = df.agg(*aggs)
    stack = ", ".join(f"'{c}', {c}" for c in cols)
    return (
        wide.selectExpr(f"stack({len(cols)}, {stack}) as (column, n_null)")
        .filter(F.col("n_null") > 0)
    )


def v3_format_checks(df: DataFrame, table: str) -> DataFrame:
    """rlike format constraints per column (READme.md:29 'formatos');
    returns (column, n_bad) for columns with violations. NULLs are not
    format violations (v2 owns those)."""
    patterns = FORMAT_PATTERNS.get(table, {})
    if not patterns:
        return df.sparkSession.createDataFrame([], "column string, n_bad long")
    aggs = [
        F.sum(
            (F.col(c).isNotNull() & ~F.col(c).rlike(p)).cast("long")
        ).alias(c)
        for c, p in patterns.items()
    ]
    wide = df.agg(*aggs)
    cols = list(patterns)
    stack = ", ".join(f"'{c}', {c}" for c in cols)
    return (
        wide.selectExpr(f"stack({len(cols)}, {stack}) as (column, n_bad)")
        .filter(F.col("n_bad") > 0)
    )


def v4_referential(
    fact: DataFrame, dim: DataFrame, fact_key: str, dim_key: str
) -> DataFrame:
    """Orphan fact keys absent from the dimension (anti-join; the
    'deslocamento' corruption class surfaces here). Returns distinct
    orphan keys with occurrence counts."""
    return (
        fact.select(F.col(fact_key).alias("orphan_key"))
        .filter(F.col("orphan_key").isNotNull())
        .join(
            dim.select(F.col(dim_key).alias("orphan_key")).distinct(),
            "orphan_key",
            "left_anti",
        )
        .groupBy("orphan_key")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


def v5_duplicate_keys(df: DataFrame, keys: list[str]) -> DataFrame:
    """Duplicate business keys (FIXTURES.md: duplicate
    (cnpj_basico, cnpj_ordem, cnpj_dv) rows). Returns keys with
    multiplicity > 1."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_copies"))
        .filter(F.col("n_copies") > 1)
    )


def month_diff(old: DataFrame, new: DataFrame, keys: list[str]) -> DataFrame:
    """Month-over-month diff of a keyed silver table: one row per
    changed entity, labeled ``added`` / ``removed`` / ``changed``.

    The reference's TRUNCATE-then-load (src/main.py:198-200) destroys
    the previous month on every reload, which is SURVEY §2.2's set-ops
    motivation; with ``ref_ym``-partitioned silver tables (A10) the
    two months coexist and this recovers the audit diff.

    Scale shape: each side collapses to (keys, payload-hash) —
    map-side, no width carried through the shuffle — then ONE
    full-outer equi-join on the keys classifies every entity. No
    exceptAll double-scan, no row payload in the join, key-partitioned
    all the way, so it holds at any month size.
    """
    assert set(old.columns) == set(new.columns), (
        sorted(set(old.columns) ^ set(new.columns))
    )
    payload = [c for c in new.columns if c not in keys]
    assert payload, "keyed diff needs at least one non-key column"

    def keyed(df: DataFrame, side: str) -> DataFrame:
        # NULL-safe payload canon: NULL and 'NULL'-the-string must not
        # collide, so each column gets a sentinel distinct from any
        # cast value before hashing.
        cells = [
            F.coalesce(F.col(c).cast("string"), F.lit("\x00null"))
            for c in payload
        ]
        return df.select(*keys, F.xxhash64(*cells).alias(f"h_{side}"))

    joined = keyed(old, "old").join(keyed(new, "new"), keys, "full_outer")
    return joined.select(
        *keys,
        F.when(F.col("h_old").isNull(), F.lit("added"))
        .when(F.col("h_new").isNull(), F.lit("removed"))
        .when(F.col("h_old") != F.col("h_new"), F.lit("changed"))
        .alias("change"),
    ).where(F.col("change").isNotNull())


def month_diff_summary(
    old: DataFrame, new: DataFrame, keys: list[str]
) -> DataFrame:
    """(change, n_entities) rollup of ``month_diff`` — the report row
    the reference's status tally (src/main.py:222-237) would print."""
    return (
        month_diff(old, new, keys)
        .groupBy("change")
        .agg(F.count(F.lit(1)).alias("n_entities"))
    )


def validation_report(
    df: DataFrame, table: str, keys: list[str] | None = None
) -> dict[str, object]:
    """Run v2/v3 (+v5 when keys given) and summarize pass/fail.

    Standalone (read-path) form: three bounded-output aggregates.
    Inside the ingest write path use ``observed_check_metrics`` +
    ``report_from_metrics`` instead — same counters, zero extra scans.
    """
    nulls = v2_null_essentials(df, table).collect()
    formats = v3_format_checks(df, table).collect()
    dups = v5_duplicate_keys(df, keys).count() if keys else 0
    return {
        "table": table,
        "null_violations": {r["column"]: r["n_null"] for r in nulls},
        "format_violations": {r["column"]: r["n_bad"] for r in formats},
        "n_duplicate_keys": dups,
        "passed": not nulls and not formats and dups == 0,
    }


def observed_check_metrics(table: str) -> list:
    """v2/v3 counters as ``observe()`` metric columns: every check is a
    sum over a row-level predicate, so the write action itself computes
    them — no post-write validation scan, and the metric payload stays
    O(columns) however large the table grows (r02 VERDICT item on the
    driver-side collects)."""
    cols = ESSENTIAL_COLUMNS.get(table, [])
    pats = FORMAT_PATTERNS.get(table, {})
    metrics = [
        F.sum(F.col(c).isNull().cast("long")).alias(f"null__{c}") for c in cols
    ]
    metrics += [
        F.sum((F.col(c).isNotNull() & ~F.col(c).rlike(p)).cast("long")).alias(
            f"fmt__{c}"
        )
        for c, p in pats.items()
    ]
    return metrics


def report_from_metrics(
    metrics: dict, table: str, n_duplicate_keys: int = 0
) -> dict[str, object]:
    """Assemble the validation_report dict from observed metric values
    (the ``null__*`` / ``fmt__*`` counters of ``observed_check_metrics``)."""
    nulls = {
        k.removeprefix("null__"): v
        for k, v in metrics.items()
        if k.startswith("null__") and v
    }
    formats = {
        k.removeprefix("fmt__"): v
        for k, v in metrics.items()
        if k.startswith("fmt__") and v
    }
    return {
        "table": table,
        "null_violations": nulls,
        "format_violations": formats,
        "n_duplicate_keys": n_duplicate_keys,
        "passed": not nulls and not formats and n_duplicate_keys == 0,
    }
