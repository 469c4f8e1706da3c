"""128-bit span-hash mode (VERDICT r11 item 7): the xxhash64 span key
carries a documented birthday bound (~1e-5 relative overcount at 1e12
spans); ``wide=True`` widens the grouping key to two independent
xxhash64 families packed in a struct, so the 100 TB exactness story
is a flag flip, not a rewrite. The flag changes ONLY the grouping
key — both modes must be output-identical wherever 64 bits don't
collide (any test SF), and the wide key must actually be 128 bits of
distinct material, not the same hash twice.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rfb_data_pipeline_spark.operators.dedup import (
    _span_table,
    d13_duplicate_spans,
    d14_dup_span_fraction,
    d17_span_dedup_action,
    d18_cleaned_corpus,
)
from tests.conftest import SF_SMALL as SF


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_d13_wide_mode_parity(spark):
    assert _sorted_rows(d13_duplicate_spans(spark, SF)) == _sorted_rows(
        d13_duplicate_spans(spark, SF, wide=True)
    )


def test_d14_wide_mode_parity(spark):
    assert _sorted_rows(d14_dup_span_fraction(spark, SF)) == _sorted_rows(
        d14_dup_span_fraction(spark, SF, wide=True)
    )


def test_d17_d18_wide_mode_parity(spark):
    """The ACTION tier (removal decisions) carries the same flag: at
    test SF no 64-bit collision exists, so the removed intervals —
    and hence every kept-token figure and cleaned_md5 — must be
    identical across modes."""
    assert _sorted_rows(d17_span_dedup_action(spark, SF)) == _sorted_rows(
        d17_span_dedup_action(spark, SF, wide=True)
    )
    assert _sorted_rows(d18_cleaned_corpus(spark, SF)) == _sorted_rows(
        d18_cleaned_corpus(spark, SF, wide=True)
    )


def test_wide_key_is_two_independent_families(spark):
    wide = _span_table(spark, SF, wide=True)
    assert dict(wide.dtypes)["span_hash"] == "struct<h1:bigint,h2:bigint>"
    # h2 comes from a seed-prefixed family: were it the same hash, the
    # struct would add bytes but no collision resistance
    row = wide.select(
        F.sum(
            (F.col("span_hash.h1") == F.col("span_hash.h2")).cast("long")
        ).alias("eq"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert row["n"] > 0 and row["eq"] == 0
    # and the narrow mode's key matches the wide mode's h1 family
    narrow = _span_table(spark, SF)
    a = narrow.groupBy("span_hash").count()
    b = wide.select(F.col("span_hash.h1").alias("span_hash")).groupBy(
        "span_hash"
    ).count()
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
