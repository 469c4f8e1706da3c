"""Skew-salting correctness + bucketed co-located join plan tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rfb_data_pipeline_spark.operators.skew import (
    colocated_join,
    salted_join,
    write_bucketed,
)
from rfb_data_pipeline_spark.plans import inspect as pi


def test_salted_join_equals_plain_join(spark):
    # heavily skewed big side: 90% of rows share one key
    big = spark.range(0, 5000).select(
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("dim_val")
    )
    plain = big.join(small, "k").select("k", "payload", "dim_val")
    salted = salted_join(big, small, "k", n_salt=8).select("k", "payload", "dim_val")
    assert plain.count() == salted.count()
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salting_spreads_hot_key(spark):
    big = spark.range(0, 1000).select(F.lit(7).alias("k"), F.col("id").alias("p"))
    salt = F.pmod(F.xxhash64("k", "p"), F.lit(8))
    n_distinct = big.select(salt.alias("s")).distinct().count()
    assert n_distinct == 8  # the single hot key fans out across salts


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.range(0, 2000).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("va")
        )
        b = spark.range(0, 2000).select(
            F.col("id").alias("k"), (F.col("id") * 5).alias("vb")
        )
        write_bucketed(a, "bkt_a", "k", n_buckets=4)
        write_bucketed(b, "bkt_b", "k", n_buckets=4)
        joined = colocated_join(spark, "bkt_a", "bkt_b", "k")
        plan = pi.explain_string(joined, "simple")
        assert "SortMergeJoin" in plan
        # pre-bucketed layout: no shuffle exchange on either side
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() == 2000
        # and the same join WITHOUT bucketing does shuffle — the
        # baseline that proves bucketing removed real work
        unbucketed = a.join(b, "k")
        assert "Exchange hashpartitioning" in pi.explain_string(unbucketed, "simple")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")
