"""Count-Min-Sketch (t10) property checks.

Oracle parity proves Spark == DuckDB; these pin the SKETCH's own
contract, which parity alone cannot: the estimate never
underestimates, and probing with one hash row is looser than (or
equal to) the min over all four.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rfb_data_pipeline_spark.operators.text import (
    _cms_bucket,
    _CMS_DEPTH,
    t10_cms_heavy_hitters,
    tokens_col,
)

SF = "/root/testdata/sf0.001"


def test_cms_never_underestimates_top_terms(spark):
    rows = t10_cms_heavy_hitters(spark, SF).collect()
    assert len(rows) == 20
    assert all(r.n_est >= r.n_exact for r in rows)


def test_cms_estimate_is_min_over_rows_for_all_terms(spark):
    """For EVERY vocab term: est >= exact, and the min over D rows is
    no looser than any single row's counter."""
    docs = spark.read.parquet(SF + "/documents.parquet")
    counts = (
        docs.select(F.explode(tokens_col()).alias("term"))
        .filter(F.length("term") > 0)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n_exact"))
    )
    sketch = (
        counts.select(
            F.posexplode(
                F.array(
                    *[_cms_bucket(i, F.col("term")) for i in range(_CMS_DEPTH)]
                )
            ).alias("i", "bucket"),
            "n_exact",
        )
        .groupBy("i", "bucket")
        .agg(F.sum("n_exact").alias("c"))
    )
    probes = counts.select(
        "term",
        "n_exact",
        F.posexplode(
            F.array(*[_cms_bucket(i, F.col("term")) for i in range(_CMS_DEPTH)])
        ).alias("i", "bucket"),
    )
    est = (
        probes.join(sketch, ["i", "bucket"])
        .groupBy("term", "n_exact")
        .agg(F.min("c").alias("n_est"), F.max("c").alias("worst_row"))
    )
    bad = est.filter(
        (F.col("n_est") < F.col("n_exact"))
        | (F.col("worst_row") < F.col("n_est"))
    ).count()
    assert bad == 0
