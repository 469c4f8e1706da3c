"""Skewed-key join evidence for the q04/q05-class fact-dim joins
(VERDICT r06 item 7; SURVEY.md §4 names ``cnpj_basico`` skew — large
holding companies owning thousands of establishments — as the 100 TB
risk on the star schema's join axis).

Builds an orders fixture whose hottest customer key owns a
multiplier-scaled share of the fact side (x1 ≈ half the table; xM
replicates the hot half M times while the uniform remainder stays
fixed — the skew RATIO grows with M, isolating the skew axis from
plain volume growth). Then runs the q04-class join chain
(orders ⋈ customer ⋈ nation → per-nation revenue) as a sort-merge
join (broadcast disabled: at 100 TB the customer dim does not fit an
executor) twice — AQE skew-join ON vs OFF — and records:

- whether the final adaptive plan actually split the hot partition
  (``SortMergeJoin(skew=true)`` / ``AQEShuffleRead ... skewed``);
- the join stage's task count and max/median task durations from the
  REST status API (the straggler the split removes).

The fixture is written as 16 files because AQE splits a skewed reduce
partition along MAPPER boundaries — a single-mapper input cannot be
split at all (a real 100 TB scan always has thousands of mappers).
Skew thresholds are scaled down to the fixture's byte sizes; at
production scale the defaults (256 MB) play the same role.

Usage: python tools/skew_check.py [mults...]   (default: 1 4)
One JSON line per (mult, skew_join_mode).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.1"
FIXTURES = "/tmp/spark_graft_skew_fixtures"
HOT_KEY = 7


def build_fixture(spark, mult: int) -> str:
    from pyspark.sql import functions as F

    dest = os.path.join(FIXTURES, f"x{mult}", "orders")
    if os.path.exists(dest):
        return dest
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    hot = orders.where(F.pmod(F.col("o_orderkey"), F.lit(2)) == 0)
    cold = orders.where(F.pmod(F.col("o_orderkey"), F.lit(2)) == 1)
    n = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1
    reps = [cold]
    for k in range(mult):
        reps.append(
            hot.withColumn(
                "o_orderkey", F.col("o_orderkey") + F.lit(k * n)
            ).withColumn("o_custkey", F.lit(HOT_KEY).cast("long"))
        )
    df = reps[0]
    for r in reps[1:]:
        df = df.unionByName(r)
    # 16 files: AQE skew split subdivides a reduce partition by mapper
    # ranges, so the fixture must have >1 mapper to be splittable.
    df.repartition(16).write.mode("overwrite").parquet(dest)
    return dest


def _api_base(spark) -> str:
    """REST base for THIS application. Spark silently binds ui.port+n
    when the pinned port is busy (spark.port.maxRetries), so a
    hardcoded port could query a DIFFERENT application's API and
    blindly taking apps[0] could pick a stale app (ADVICE r07): read
    the bound URL from sparkContext.uiWebUrl and address the app by
    sc.applicationId."""
    sc = spark.sparkContext
    return f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"


def _stage_metrics(spark) -> list[dict]:
    return json.load(
        urllib.request.urlopen(
            f"{_api_base(spark)}/stages?status=complete", timeout=10
        )
    )


def run_q04_class(spark, fixture: str, skew_on: bool) -> dict:
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_on).lower())
    # scaled-down thresholds: the fixture's hot partition is ~MBs, not
    # the 256 MB production default — same machinery, same decision
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64k"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32k")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    orders = spark.read.parquet(fixture)
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    nation = spark.read.parquet(f"{SF}/nation.parquet")
    pre_stages = {s["stageId"] for s in _stage_metrics(spark)}
    t0 = time.time()
    df = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    rows = df.collect()
    wall = time.time() - t0
    final_plan = (
        df._jdf.queryExecution().executedPlan().toString()
    ).split("== Initial Plan ==")[0]
    stages = [
        s
        for s in _stage_metrics(spark)
        if s["stageId"] not in pre_stages
    ]
    # the join stage is the one with the largest shuffle READ
    join_stage = max(stages, key=lambda s: s.get("shuffleReadBytes", 0))
    return {
        "skew_join": skew_on,
        "wall_s": round(wall, 2),
        "n_rows": len(rows),
        "plan_skew_split": "skew=true" in final_plan,
        "join_stage_tasks": join_stage["numCompleteTasks"],
        "join_stage_task_ms": _max_task_ms(spark, join_stage),
    }


def _max_task_ms(spark, stage: dict) -> dict | None:
    # stage summary carries no per-task max directly; use the task
    # summary endpoint
    try:
        summ = json.load(
            urllib.request.urlopen(
                f"{_api_base(spark)}/stages/{stage['stageId']}/"
                f"{stage['attemptId']}/taskSummary?quantiles=0.5,1.0",
                timeout=10,
            )
        )
        med, mx = summ["duration"]
        out = {"median_ms": int(med), "max_ms": int(mx)}
        # per-task shuffle-read bytes: deterministic (unlike ms) — the
        # straggler signature is ONE task reading the whole hot
        # partition; the split caps every task near the advisory size
        srm = summ.get("shuffleReadMetrics") or {}
        rb = srm.get("readBytes") or srm.get("totalBlocksFetched")
        if rb:
            out["median_read_bytes"] = int(rb[0])
            out["max_read_bytes"] = int(rb[1])
        return out
    except Exception:
        return None


def main() -> None:
    mults = [int(a) for a in sys.argv[1:]] or [1, 4]
    from pyspark.sql import SparkSession

    boot = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    fixtures = {m: build_fixture(boot, m) for m in mults}
    boot.stop()

    for m in mults:
        for skew_on in (False, True):
            spark = (
                SparkSession.builder.master("local[32]")
                .config("spark.sql.shuffle.partitions", "32")
                .config("spark.ui.enabled", "true")
                .config("spark.ui.port", "4056")  # preferred; the bound
                # port is re-read from uiWebUrl, never assumed
                .config("spark.sql.adaptive.enabled", "true")
                .getOrCreate()
            )
            rec = run_q04_class(spark, fixtures[m], skew_on)
            rec["mult"] = m
            print(json.dumps(rec), flush=True)
            spark.stop()


if __name__ == "__main__":
    main()
