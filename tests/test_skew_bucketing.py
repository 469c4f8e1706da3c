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


def test_aqe_splits_skewed_q04_class_join(spark, tmp_path):
    """AQE skew-join evidence for the q04/q05-class fact-dim join
    (SURVEY §4: cnpj_basico-style hot keys): with a multi-file skewed
    fact and broadcast disabled, the final adaptive plan must split
    the hot partition (SortMergeJoin(skew=true)); with skew-join off
    it must not. tools/skew_check.py records the byte-level evidence
    (straggler read bytes flat vs growing) at sf0.1."""
    sf = "/root/testdata/sf0.001"
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    cust = spark.read.parquet(f"{sf}/customer.parquet")
    skewed = orders.withColumn(
        "o_custkey",
        F.when(
            F.pmod(F.col("o_orderkey"), F.lit(4)) < 3, F.lit(7)
        ).otherwise(F.col("o_custkey")),
    )
    # >1 mapper: AQE splits a skewed reduce partition along MAPPER
    # boundaries, so a single-file input is never splittable
    fixture = str(tmp_path / "skewed_orders")
    skewed.repartition(8).write.parquet(fixture)

    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "4k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "2k",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.5",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {}
    for k, v in confs.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        def final_plan(skew_on: bool) -> str:
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.enabled", str(skew_on).lower()
            )
            fact = spark.read.parquet(fixture)
            df = (
                fact.join(cust, fact.o_custkey == cust.c_custkey)
                .groupBy("c_nationkey")
                .agg(F.sum("o_totalprice").alias("rev"))
            )
            df.collect()
            return (
                df._jdf.queryExecution().executedPlan().toString()
            ).split("== Initial Plan ==")[0]

        with_split = final_plan(True)
        assert "skew=true" in with_split, with_split
        assert "skewed" in with_split  # AQEShuffleRead ... skewed
        without = final_plan(False)
        assert "skew=true" not in without
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
