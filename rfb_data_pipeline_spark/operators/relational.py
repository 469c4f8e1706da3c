"""Core relational operator surface (SURVEY.md §2.2).

Every public query here is declared with the DataFrame API so Catalyst
performs predicate pushdown, column pruning, join selection and AQE
re-planning. Each query has a matching DuckDB oracle in ``ORACLE``;
column aliases are identical on both sides (driver hashes values after
sorting columns by name).

Scale notes per query are inline — the guiding rules:
- dimension joins (region/nation/supplier) are broadcast; fact×fact
  joins shuffle on their equi-keys and rely on AQE skew handling;
- aggregates are hash-based with map-side partial aggregation (Catalyst
  default) — no driver-side loops anywhere;
- doubles are rounded at the output edge only, to stabilize the
  cross-engine value hash, never mid-computation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rfb_data_pipeline_spark.catalog import load_tables
from rfb_data_pipeline_spark.functions.exactround import (
    finish_sum,
    ratio_round,
    sql_ratio_round,
    money_avg,
    money_sum,
    sql_money_avg,
    sql_money_sum,
    units,
)


def _t(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return load_tables(spark, sf_dir, tables=tuple(names), register_views=False)


# --------------------------------------------------------------------------
# q01 — full-scan filter + hash aggregate (TPC-H Q1 shape).
# Scale: single shuffle on the 2-value group key; partial aggregation
# collapses each input partition to ≤|groups| rows before the exchange.


def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 4, 2
            ).alias("sum_disc_price"),
            money_sum(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax")),
                6,
                2,
            ).alias("sum_charge"),
            money_avg(F.col("l_quantity"), 0, 4).alias("avg_qty"),
            money_avg(F.col("l_extendedprice"), 2, 4).alias("avg_price"),
            money_avg(F.col("l_discount"), 2, 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_Q01_SQL = f"""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)      AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       {sql_money_sum('l_extendedprice * (1 - l_discount)', 4, 2)} AS sum_disc_price,
       {sql_money_sum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6, 2)} AS sum_charge,
       {sql_money_avg('l_quantity', 0, 4)} AS avg_qty,
       {sql_money_avg('l_extendedprice', 2, 4)} AS avg_price,
       {sql_money_avg('l_discount', 2, 4)} AS avg_disc,
       count(*)                       AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# q02 — argmin/argmax per group (TPC-H Q2's min-cost-supplier shape,
# adapted to our schema): the richest/poorest supplier per nation via
# min_by/max_by — a single hash aggregate, no self-join or window.


def q02_argmin_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "supplier", "nation")
    joined = t["supplier"].join(
        F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return joined.groupBy("n_name").agg(
        F.min_by("s_name", "s_acctbal").alias("poorest_supplier"),
        F.round(F.min("s_acctbal"), 2).alias("min_acctbal"),
        F.max_by("s_name", "s_acctbal").alias("richest_supplier"),
        F.round(F.max("s_acctbal"), 2).alias("max_acctbal"),
    )


_Q02_SQL = """
SELECT n_name,
       min_by(s_name, s_acctbal)   AS poorest_supplier,
       round(min(s_acctbal), 2)    AS min_acctbal,
       max_by(s_name, s_acctbal)   AS richest_supplier,
       round(max(s_acctbal), 2)    AS max_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
"""


# --------------------------------------------------------------------------
# q03 — selective fact×fact×dim join + top-k (TPC-H Q3 shape).
# Scale: customer filter prunes before the join (pushdown); orders and
# lineitem shuffle on their keys; final top-10 is a TakeOrdered (no full
# sort materialization).


def q03_topk_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "customer", "orders", "lineitem")
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    orders = t["orders"].filter(F.col("o_orderdate") < F.lit("1995-03-15"))
    li = t["lineitem"].filter(F.col("l_shipdate") > F.lit("1995-03-15"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", F.col("o_orderdate").cast("date").alias("o_orderdate"))
        .agg(
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 4, 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


_Q03_SQL = f"""
SELECT l_orderkey,
       CAST(o_orderdate AS DATE)                              AS o_orderdate,
       {sql_money_sum('l_extendedprice * (1 - l_discount)', 4, 2)} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15'
  AND l_shipdate  > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


# --------------------------------------------------------------------------
# q05 — snowflake join through two broadcast dimensions (TPC-H Q5 shape).
# Scale: region/nation broadcast (they are tiny at every SF); the
# fact-side joins shuffle on orderkey/custkey/suppkey. The
# c_nationkey = s_nationkey condition closes the snowflake.


def q05_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region"
    )
    region = t["region"].filter(F.col("r_name") == "ASIA")
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    return (
        t["lineitem"]
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(
            t["supplier"],
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 4, 2
            ).alias("revenue")
        )
    )


_Q05_SQL = f"""
SELECT n_name, {sql_money_sum('l_extendedprice * (1 - l_discount)', 4, 2)} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1995-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


# --------------------------------------------------------------------------
# q04 — flagship: revenue by nation across the star schema. Chosen as
# the entry() smoke query because it returns one row per nation at
# every scale factor (no selective predicates that vanish at sf0.001).
# Scale: nation broadcast; orders×customer and lineitem×orders shuffle
# on their keys with AQE-coalesced partitions.


def q04_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    # Partial-aggregation pushdown done by hand (Catalyst doesn't push
    # aggregates through joins): revenue per order first shrinks the
    # lineitem side ~4x before any join, and turns the expensive
    # countDistinct(o_orderkey) into a plain count — ~1.7x measured.
    per_order = t["lineitem"].groupBy("l_orderkey").agg(
        # exact 10^-4-grid units so the two-level sum stays lossless
        # (the exactround discipline — associativity holds for ints)
        F.sum(
            units(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
        ).alias("order_rev_units")
    )
    return (
        per_order
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            finish_sum(F.sum("order_rev_units"), 4, 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(F.desc("revenue"))
    )


_Q04_SQL = f"""
SELECT n_name,
       {sql_money_sum('l_extendedprice * (1 - l_discount)', 4, 2)} AS revenue,
       count(DISTINCT o_orderkey) AS n_orders
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY revenue DESC
"""


# --------------------------------------------------------------------------
# q06 — pure scan-filter-aggregate (TPC-H Q6 shape); the whole query is
# one WholeStageCodegen span with all predicates pushed to the parquet
# scan. The canonical "is pushdown working" probe.


def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            money_sum(
                F.col("l_extendedprice") * F.col("l_discount"), 4, 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


_Q06_SQL = f"""
SELECT {sql_money_sum('l_extendedprice * l_discount', 4, 2)} AS revenue,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# --------------------------------------------------------------------------
# q07 — left semi join (EXISTS). Scale: semi joins ship only the join
# key of the probe side and stop at first match — cheaper than inner
# join + distinct.


def q07_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "orders", "lineitem")
    big_items = t["lineitem"].filter(F.col("l_quantity") >= 49).select("l_orderkey")
    return (
        t["orders"]
        .join(big_items, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
    )


_Q07_SQL = """
SELECT o_orderstatus, count(*) AS n_orders, round(sum(o_totalprice), 2) AS sum_price
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
GROUP BY o_orderstatus
"""


# --------------------------------------------------------------------------
# q08 — left anti join (NOT EXISTS): the referential-integrity idiom
# (SURVEY.md §2.2 — estabelecimentos without empresas). Customers that
# never placed an urgent order, tallied by segment.


def q08_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "customer", "orders")
    urgent = t["orders"].filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        t["customer"]
        .join(
            urgent.select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("sum_acctbal"),
        )
    )


_Q08_SQL = """
SELECT c_mktsegment, count(*) AS n_customers, round(sum(c_acctbal), 2) AS sum_acctbal
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
"""


# --------------------------------------------------------------------------
# q09 — top-k per group via ranked window (the dedup/topk idiom,
# SURVEY.md §2.2 windows). Deterministic tie-break on orderkey.
# Scale: one shuffle on the partition key; no global sort.


def q09_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "customer", "orders")
    joined = t["orders"].join(
        t["customer"], F.col("o_custkey") == F.col("c_custkey")
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        joined.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "c_mktsegment",
            "rk",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
        )
    )


_Q09_SQL = """
SELECT c_mktsegment, rk, o_orderkey, totalprice
FROM (
  SELECT c_mktsegment,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk,
         o_orderkey,
         round(o_totalprice, 2) AS totalprice
  FROM orders JOIN customer ON o_custkey = c_custkey
) WHERE rk <= 3
"""


# --------------------------------------------------------------------------
# q10 — time-series lag window: month-over-month revenue delta across
# the monthly axis (the reference's only temporal notion,
# src/main.py:257-258, generalized). Scale: aggregate first (tiny
# result), window over the aggregate — never window over the fact table.


def q10_monthly_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")["orders"]
    monthly = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month")
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    w = Window.orderBy("month")
    return monthly.select(
        "month",
        "revenue",
        (F.round(F.col("revenue") - F.lag("revenue", 1).over(w), 2) + F.lit(0.0)).alias(
            "mom_delta"
        ),
    )


_Q10_SQL = """
SELECT month, revenue,
       round(revenue - lag(revenue, 1) OVER (ORDER BY month), 2) + 0.0 AS mom_delta
FROM (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         round(sum(o_totalprice), 2) AS revenue
  FROM orders GROUP BY 1
)
"""


# --------------------------------------------------------------------------
# q11 — ROLLUP hierarchy totals (region → nation → grand total); the
# generalized form of the reference's status tally report
# (src/main.py:222-237). NULL group markers normalized via coalesce so
# both engines hash identically.


def q11_rollup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "customer", "nation", "region")
    joined = (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("sum_acctbal"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "n_customers",
            "sum_acctbal",
        )
    )


_Q11_SQL = """
SELECT coalesce(r_name, 'ALL') AS region,
       coalesce(n_name, 'ALL') AS nation,
       count(*) AS n_customers,
       round(sum(c_acctbal), 2) AS sum_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


# --------------------------------------------------------------------------
# q12 — set operations: customers active in 1995 but not 1996
# (EXCEPT), the old-month vs new-month diff idiom (SURVEY.md §2.2 set
# ops). Scale: except distinct = shuffle on the full row; keep the
# projected key narrow.


def q12_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")["orders"]
    y95 = orders.filter(F.year("o_orderdate") == 1995).select("o_custkey").distinct()
    y96 = orders.filter(F.year("o_orderdate") == 1996).select("o_custkey").distinct()
    churned = y95.exceptAll(y96)
    return churned.agg(F.count(F.lit(1)).alias("n_churned"))


_Q12_SQL = """
SELECT count(*) AS n_churned FROM (
  SELECT DISTINCT o_custkey FROM orders WHERE extract(year FROM o_orderdate) = 1995
  EXCEPT
  SELECT DISTINCT o_custkey FROM orders WHERE extract(year FROM o_orderdate) = 1996
)
"""


# --------------------------------------------------------------------------
# q13 — scalar string-function layer (SURVEY.md §2.2 scalar functions;
# the lpad/upper/split/regexp surface the RFB normalize layer needs —
# reference src/main.py:186-190 routing & CNPJ leading zeros).


def q13_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")["part"]
    return part.select(
        "p_partkey",
        F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("padded_key"),
        F.upper("p_brand").alias("brand_upper"),
        F.regexp_extract("p_type", r"^(\w+)", 1).alias("type_first_word"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.trim(F.lower("p_name")).alias("name_norm"),
        # initcap on a single-token column: the DuckDB oracle spells it
        # upper(first)||lower(rest), which matches exactly when the
        # input has no internal spaces (p_brand is 'Brand#NN').
        F.initcap(F.lower("p_brand")).alias("brand_title"),
    )


_Q13_SQL = """
SELECT p_partkey,
       lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS padded_key,
       upper(p_brand)                            AS brand_upper,
       regexp_extract(p_type, '^(\\w+)', 1)      AS type_first_word,
       length(p_name)                            AS name_len,
       concat_ws('|', p_brand, p_type)           AS brand_type,
       substring(p_name, 1, 5)                   AS name_prefix,
       trim(lower(p_name))                       AS name_norm,
       upper(substring(p_brand, 1, 1)) || lower(substring(p_brand, 2))
                                                 AS brand_title
FROM part
"""


# --------------------------------------------------------------------------
# q14 — date/time scalar layer (reference src/main.py:247-255 date
# handling, Spark-native): extraction, trunc, formatting, arithmetic.


def q14_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")["orders"]
    return (
        orders.select(
            F.year("o_orderdate").alias("yr"),
            F.quarter("o_orderdate").alias("qtr"),
            F.month("o_orderdate").alias("mo"),
            F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
            F.col("o_totalprice"),
        )
        .groupBy("yr", "qtr", "mo", "ym")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money_avg(F.col("o_totalprice"), 2, 2).alias("avg_price"),
        )
        .withColumn(
            "first_of_month",
            F.make_date(F.col("yr"), F.col("mo"), F.lit(1)),
        )
        .withColumn(
            # whole months since the corpus epoch: months_between on
            # first-of-month dates is integral, so the double is exact
            # and matches DuckDB's integer month diff
            "months_since_epoch",
            F.months_between(
                F.col("first_of_month"), F.lit("1995-01-01").cast("date")
            ),
        )
    )


_Q14_SQL = f"""
SELECT extract(year FROM o_orderdate)     AS yr,
       extract(quarter FROM o_orderdate)  AS qtr,
       extract(month FROM o_orderdate)    AS mo,
       strftime(o_orderdate, '%Y-%m')     AS ym,
       count(*)                           AS n_orders,
       {sql_money_avg('o_totalprice', 2, 2)} AS avg_price,
       make_date(CAST(extract(year FROM o_orderdate) AS INTEGER),
                 CAST(extract(month FROM o_orderdate) AS INTEGER), 1)
                                          AS first_of_month,
       CAST(date_diff('month', DATE '1995-01-01',
                      make_date(CAST(extract(year FROM o_orderdate) AS INTEGER),
                                CAST(extract(month FROM o_orderdate) AS INTEGER), 1))
            AS DOUBLE)                    AS months_since_epoch
FROM orders
GROUP BY 1, 2, 3, 4
"""


# --------------------------------------------------------------------------
# q15 — conditional aggregation (the null-rate / format-check shape of
# the README validation suite, READme.md:29): sum(CASE WHEN), plus
# empty→NULL normalization via nullif.


def q15_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("l_discount") > 0.05, 1).otherwise(0)).alias(
            "n_high_discount"
        ),
        money_avg(
            F.when(F.col("l_quantity") >= 25, F.col("l_extendedprice")), 2, 2
        ).alias("avg_price_bulk"),
        F.sum(
            F.when(F.col("l_linestatus") == "F", F.col("l_quantity")).otherwise(0)
        ).alias("qty_finished"),
    )


_Q15_SQL = f"""
SELECT l_returnflag,
       count(*) AS n_rows,
       CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_discount,
       {sql_money_avg('CASE WHEN l_quantity >= 25 THEN l_extendedprice END', 2, 2)} AS avg_price_bulk,
       sum(CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0 END) AS qty_finished
FROM lineitem
GROUP BY l_returnflag
"""


# --------------------------------------------------------------------------
# q16 — GROUP BY + HAVING; supplier count per nation with a floor.


def q16_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Region-level grouping keeps the HAVING predicate non-vacuous at
    # every test SF (sf0.001 has 10 suppliers over 5 regions; a
    # nation-level count >= 2 selects zero groups there and the
    # oracle compare passes vacuously).
    t = _t(spark, sf_dir, "supplier", "nation", "region")
    return (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            money_avg(F.col("s_acctbal"), 2, 2).alias("avg_acctbal"),
        )
        .filter(F.col("n_suppliers") >= 2)
    )


_Q16_SQL = f"""
SELECT r_name, count(*) AS n_suppliers, {sql_money_avg('s_acctbal', 2, 2)} AS avg_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
HAVING count(*) >= 2
"""


# --------------------------------------------------------------------------
# q17 — distinct aggregation: exact COUNT(DISTINCT) per group. (The
# 100 TB path uses approx_count_distinct/HLL — see q26 in bench, which
# has no exact oracle by design.)


def q17_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


_Q17_SQL = """
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_suppliers,
       count(DISTINCT l_orderkey) AS n_orders
FROM lineitem
GROUP BY l_returnflag
"""


# --------------------------------------------------------------------------
# q18 — theta/range join against a derived band table. The band side is
# tiny → broadcast nested-loop, which is the right physical plan; at
# scale the alternative is a bucketed range join on a binned key.


def q18_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")["part"]
    bands = spark.createDataFrame(
        [("budget", 0.0, 930.0), ("mid", 930.0, 970.0), ("premium", 970.0, 1e9)],
        ["band", "lo", "hi"],
    )
    return (
        part.join(
            F.broadcast(bands),
            (F.col("p_retailprice") >= F.col("lo"))
            & (F.col("p_retailprice") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            money_avg(F.col("p_retailprice"), 2, 2).alias("avg_price"),
        )
    )


_Q18_SQL = f"""
SELECT band, count(*) AS n_parts, {sql_money_avg('p_retailprice', 2, 2)} AS avg_price
FROM part
JOIN (VALUES ('budget', 0.0, 930.0),
             ('mid', 930.0, 970.0),
             ('premium', 970.0, 1e9)) AS bands(band, lo, hi)
  ON p_retailprice >= lo AND p_retailprice < hi
GROUP BY band
"""


# --------------------------------------------------------------------------
# q19 — CUBE over two independent dimensions (order status × priority).


def q19_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")["orders"]
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
        )
    )


_Q19_SQL = """
SELECT coalesce(o_orderstatus, 'ALL')   AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*) AS n_orders
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


# --------------------------------------------------------------------------
# q20 — running total (frame spec rowsBetween): cumulative daily
# revenue within one month. Aggregate-first, then window the small
# result (same scale rule as q10).


def q20_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")["orders"]
    daily = (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01"))
            & (F.col("o_orderdate") < F.lit("1995-04-01"))
        )
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "day", "revenue", F.round(F.sum("revenue").over(w), 2).alias("cum_revenue")
    )


_Q20_SQL = """
SELECT day, revenue,
       round(sum(revenue) OVER (ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS cum_revenue
FROM (
  SELECT CAST(o_orderdate AS DATE) AS day, round(sum(o_totalprice), 2) AS revenue
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1995-04-01'
  GROUP BY 1
)
"""


# --------------------------------------------------------------------------
# q21 — rank / dense_rank: suppliers ranked by balance within nation.


def q21_rank_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "supplier", "nation")
    joined = t["supplier"].join(
        F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey")
    )
    w = Window.partitionBy("n_name").orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    return joined.select(
        "n_name",
        "s_suppkey",
        F.round("s_acctbal", 2).alias("acctbal"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    ).filter(F.col("rnk") <= 5)


_Q21_SQL = """
SELECT * FROM (
  SELECT n_name, s_suppkey, round(s_acctbal, 2) AS acctbal,
         rank()       OVER (PARTITION BY n_name ORDER BY s_acctbal DESC, s_suppkey ASC) AS rnk,
         dense_rank() OVER (PARTITION BY n_name ORDER BY s_acctbal DESC, s_suppkey ASC) AS drnk
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
) WHERE rnk <= 5
"""


# --------------------------------------------------------------------------
# q22 — union of part-files (the RFB multi-part zip idiom,
# src/main.py:62-71): two disjoint slices unioned by name then
# aggregated; exercises unionByName.


def q22_union_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")["orders"]
    part1 = orders.filter(F.col("o_orderkey") % 2 == 0)
    part2 = orders.filter(F.col("o_orderkey") % 2 == 1).select(
        *reversed(orders.columns)
    )
    return (
        part1.unionByName(part2)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
    )


_Q22_SQL = """
SELECT o_orderstatus, count(*) AS n_orders, count(DISTINCT o_custkey) AS n_customers
FROM (
  SELECT * FROM orders WHERE o_orderkey % 2 = 0
  UNION ALL
  SELECT * FROM orders WHERE o_orderkey % 2 = 1
)
GROUP BY o_orderstatus
"""


# --------------------------------------------------------------------------
# q23 — exact median / percentile statistics per group. Spark's
# median() and DuckDB's median() both interpolate for even counts.


def q23_median_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")["orders"]
    return orders.groupBy("o_orderstatus").agg(
        F.round(F.median("o_totalprice"), 2).alias("median_price"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        F.count(F.lit(1)).alias("n_orders"),
    )


_Q23_SQL = """
SELECT o_orderstatus,
       round(median(o_totalprice), 2) AS median_price,
       round(min(o_totalprice), 2)    AS min_price,
       round(max(o_totalprice), 2)    AS max_price,
       count(*)                       AS n_orders
FROM orders
GROUP BY o_orderstatus
"""


# --------------------------------------------------------------------------
# q24 — approximate distinct counting (HyperLogLog++). The 100 TB
# cardinality path (SURVEY.md §2.2: approx_count_distinct for CNPJ
# cardinality): sketches merge associatively, so the count runs with
# map-side partials and constant memory per group.
#
# Hash-checkable since r08 (VERDICT r07 item 1): the raw HLL estimate
# is engine-specific, so the query emits the *verdict* instead — the
# exact distinct count (bit-portable long) plus ``hll_within_5pct``
# and an integer error bucket, both computed Spark-side from the live
# sketch against the live exact value. The DuckDB twin computes the
# exact side and pins the expected verdict literals (TRUE / 0): if the
# sketch ever drifts past 5%, Spark emits FALSE/≥1 and the driver's
# value hash fails. rsd=0.01 targets 1% relative standard deviation,
# so the 5% band is >4 sigma; HLL register-max merge is commutative,
# so the estimate is run-order deterministic.
#
# Scale: the exact count_distinct branch is the VERIFICATION tier
# (expand + two-phase agg); the production 100 TB path is the sketch
# alone — same contract split as s03 exact vs s02/s06 banded.


def _sketch_verdict(approx, exact, tol_num: int, tol_den: int):
    """(within_tolerance, err_bucket) for an integer sketch estimate.

    within = |approx - exact| * tol_den <= exact * tol_num, all in
    long arithmetic (order- and engine-deterministic); bucket =
    floor(|approx - exact| * tol_den / (tol_num * exact)) so any
    in-tolerance estimate lands in bucket 0. ``greatest(exact, 1)``
    guards the ANSI divide-by-zero class on degenerate groups.
    """
    err = F.abs(approx - exact)
    within = (err * F.lit(tol_den)) <= (exact * F.lit(tol_num))
    # Bucket is gated on ``within`` so the two columns can never
    # contradict at the exact tolerance boundary (ADVICE r08 #1:
    # err*tol_den == exact*tol_num used to floor to bucket 1 while
    # within was TRUE — a confusing false-positive hash break).
    bucket = F.when(within, F.lit(0).cast("long")).otherwise(
        F.floor(
            (err * F.lit(tol_den))
            / (F.greatest(exact, F.lit(1)) * F.lit(tol_num))
        )
    )
    return within, bucket


def q24_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    # Exact tier and sketch run as SEPARATE branches joined on the
    # 3-row group frame: a single agg carrying count_distinct + the
    # HLL forces an Expand where every duplicated row feeds the
    # rsd=0.01 sketch — measured 8x slower (8.6 s vs 1.0 s at sf0.1)
    # than this split. The exact side is the classic scalable
    # two-stage distinct (partial map-side dedup on (flag, key), then
    # a count), and n_rows falls out of the same pass.
    exact = (
        li.select("l_returnflag", "l_orderkey")
        .groupBy("l_returnflag", "l_orderkey")
        .agg(F.count(F.lit(1)).alias("_nr"))
        .groupBy("l_returnflag")
        .agg(
            # NULL-key mirroring (ADVICE r08 #2): count(DISTINCT) in
            # the DuckDB twin and approx_count_distinct both skip
            # NULL keys, so the exact tier must not count the NULL
            # group — while n_rows stays count(*) over ALL rows.
            # TPC-H l_orderkey is non-null, but the contract holds
            # for any input (q33 got the same treatment in r08).
            F.count(F.col("l_orderkey")).alias("exact_orders"),
            F.sum("_nr").alias("n_rows"),
        )
    )
    sketch = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("_approx")
    )
    within, bucket = _sketch_verdict(
        F.col("_approx"), F.col("exact_orders"), tol_num=1, tol_den=20
    )
    return exact.join(F.broadcast(sketch), "l_returnflag").select(
        "l_returnflag",
        "exact_orders",
        "n_rows",
        within.alias("hll_within_5pct"),
        bucket.alias("hll_err_bucket"),
    )


_Q24_SQL = """
SELECT l_returnflag,
       count(DISTINCT l_orderkey)   AS exact_orders,
       count(*)                     AS n_rows,
       TRUE                         AS hll_within_5pct,
       CAST(0 AS BIGINT)            AS hll_err_bucket
FROM lineitem
GROUP BY l_returnflag
"""


# --------------------------------------------------------------------------
# q25 — array aggregation (the sócios-per-empresa idiom, SURVEY.md
# §2.2 collect_list/collect_set): distinct order priorities per
# customer as a sorted array (sorted → deterministic across engines).


def q25_collect_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Output is a ','-joined sorted string, not a raw array: the driver's
    # pandas canonicalizer cannot sort/hash list cells (round-1 q25 crash,
    # CORRECTNESS_r01.json), and a scalar string is hash-stable anyway.
    orders = _t(spark, sf_dir, "orders")["orders"]
    return orders.groupBy("o_custkey").agg(
        F.array_join(F.sort_array(F.collect_set("o_orderpriority")), ",").alias(
            "priorities"
        ),
        F.count(F.lit(1)).alias("n_orders"),
    )


_Q25_SQL = """
SELECT o_custkey,
       list_aggregate(list_sort(list_distinct(list(o_orderpriority))), 'string_agg', ',') AS priorities,
       count(*) AS n_orders
FROM orders
GROUP BY o_custkey
"""


# --------------------------------------------------------------------------
# q26 — INTERSECT: customers active in both 1995 and 1996 (the
# companion of q12's EXCEPT diff).


def q26_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")["orders"]
    y95 = orders.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    y96 = orders.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    return y95.intersect(y96).agg(F.count(F.lit(1)).alias("n_retained"))


_Q26_SQL = """
SELECT count(*) AS n_retained FROM (
  SELECT o_custkey FROM orders WHERE extract(year FROM o_orderdate) = 1995
  INTERSECT
  SELECT o_custkey FROM orders WHERE extract(year FROM o_orderdate) = 1996
)
"""


# --------------------------------------------------------------------------
# q27 — correlated scalar subquery shape: customers whose balance
# exceeds their nation's average. Spark expresses it as a window (one
# shuffle, no rescan); the oracle keeps the correlated-subquery
# spelling — two independent formulations, same rows.


def q27_above_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "customer", "nation")
    joined = t["customer"].join(
        F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey")
    )
    w = Window.partitionBy("c_nationkey")
    return (
        joined.withColumn("nation_avg", F.avg("c_acctbal").over(w))
        .filter(F.col("c_acctbal") > F.col("nation_avg"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_above_avg"),
            F.round(F.max("c_acctbal"), 2).alias("max_acctbal"),
        )
    )


_Q27_SQL = """
SELECT n_name, count(*) AS n_above_avg, round(max(c_acctbal), 2) AS max_acctbal
FROM customer c JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                   WHERE c2.c_nationkey = c.c_nationkey)
GROUP BY n_name
"""


# --------------------------------------------------------------------------
# q28 — explicit GROUPING SETS (the generalization of q11's ROLLUP /
# q19's CUBE): per-(flag,status), per-flag, and grand-total rows in one
# aggregate pass. Spark compiles all three sets into a single Expand +
# hash aggregate — one scan, one shuffle.


def q28_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    li.createOrReplaceTempView("q28_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               count(*) AS n_rows,
               round(sum(l_extendedprice), 2) AS sum_price
        FROM q28_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), ())
        """
    )


_Q28_SQL = """
SELECT l_returnflag, l_linestatus,
       count(*) AS n_rows,
       round(sum(l_extendedprice), 2) AS sum_price
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


# --------------------------------------------------------------------------
# q29 — distribution ranking: quartile bucket (ntile) and percentile
# position (percent_rank) of suppliers by balance. Ties broken by key
# so both engines rank identically.
#
# Scale: a bare ``Window.orderBy`` computes the global rank through ONE
# task (WindowExec warns and funnels the whole table). Instead this is
# the banded two-phase global rank (same family as x09/e14's banded
# prefix sums): rows are bucketed into value-range bands of the sort
# key (broadcast min/max, linear scale — equal keys always share a
# band, so per-band order + band order == global order), phase 1 ranks
# within each band in parallel, phase 2 turns the tiny per-band counts
# into cumulative offsets and broadcasts them back. ntile/percent_rank
# are then pure arithmetic on (global_rank, n): because the tie-break
# makes the order total, rank()==row_number(), percent_rank is
# (rank-1)/(n-1), and ntile(k)'s first n%k buckets hold ceil(n/k) rows
# (the SQL-standard sizing both engines implement). At 100 TB widen
# Q29_BANDS; the single-partition frame stays |bands| rows.

Q29_BANDS = 32


def q29_ntile_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = _t(spark, sf_dir, "supplier")["supplier"].select("s_suppkey", "s_acctbal")
    bounds = sup.agg(
        F.min("s_acctbal").alias("_lo"),
        F.max("s_acctbal").alias("_hi"),
        F.count(F.lit(1)).alias("_n"),
    )
    span = F.col("_hi") - F.col("_lo")
    banded = sup.join(F.broadcast(bounds)).withColumn(
        "_band",
        F.when(span == 0, F.lit(0)).otherwise(
            F.least(
                F.lit(Q29_BANDS - 1),
                F.floor((F.col("_hi") - F.col("s_acctbal")) * Q29_BANDS / span),
            )
        ),
    )
    wb = Window.partitionBy("_band").orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    local = banded.withColumn("_local_rn", F.row_number().over(wb))
    offsets = (
        banded.groupBy("_band")
        .agg(F.count(F.lit(1)).alias("_band_n"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_band_n").over(
                    Window.orderBy("_band").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("_band", "_offset")
    )
    rank = F.col("_offset") + F.col("_local_rn")
    k = F.lit(4)
    q, r = F.floor(F.col("_n") / k), F.col("_n") % k
    ntile = F.when(rank <= r * (q + 1), F.ceil(rank / (q + 1))).otherwise(
        r + F.ceil((rank - r * (q + 1)) / F.when(q == 0, 1).otherwise(q))
    )
    return (
        local.join(F.broadcast(offsets), "_band")
        .select(
            "s_suppkey",
            F.round("s_acctbal", 2).alias("acctbal"),
            ntile.cast("int").alias("quartile"),
            ratio_round(rank - 1, F.col("_n") - 1, 4, nonneg=True).alias("pct_rank"),
        )
    )


_Q29_SQL = f"""
SELECT s_suppkey,
       round(s_acctbal, 2) AS acctbal,
       ntile(4) OVER (ORDER BY s_acctbal DESC, s_suppkey ASC) AS quartile,
       {sql_ratio_round('rank() OVER (ORDER BY s_acctbal DESC, s_suppkey ASC) - 1', 'count(*) OVER () - 1', 4, nonneg=True)}
         AS pct_rank
FROM supplier
"""


# --------------------------------------------------------------------------
# q30 — RANGE-frame moving aggregate: 7-day trailing order revenue per
# day. The frame is keyed on day-number (days since epoch) so the
# range bound means calendar days, not row counts — gaps in the date
# sequence are handled by the frame semantics, not by densification.


def q30_moving_range_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")["orders"]
    daily = (
        orders.groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("day_rev"))
        .withColumn("day_num", F.datediff(F.col("d"), F.lit("1970-01-01")))
    )
    w = Window.orderBy("day_num").rangeBetween(-6, 0)
    return daily.select(
        "d",
        "day_rev",
        F.round(F.sum("day_rev").over(w), 2).alias("rev_7d"),
    )


_Q30_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         round(sum(o_totalprice), 2) AS day_rev,
         date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day_num
  FROM orders GROUP BY 1
)
SELECT d, day_rev,
       round(sum(day_rev) OVER (ORDER BY day_num
                                RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 2)
         AS rev_7d
FROM daily
"""


# --------------------------------------------------------------------------
# q33 — approximate quantiles (Greenwald-Khanna / relative-error
# sketch). With q24's HLL this completes the mergeable-sketch family:
# the sketch merges associatively, so percentiles over 100 TB run with
# map-side partials and bounded memory where an exact percentile needs
# a full sort.
#
# Hash-checkable since r08 (VERDICT r07 item 1), same verdict design
# as q24: the output carries the EXACT discrete percentiles in integer
# cents (bit-portable) plus ``gk_within_2pct`` / ``gk_err_bucket``
# computed Spark-side from the live percentile_approx sketch; the
# DuckDB twin recomputes the exact side with the identical cumulative-
# histogram SQL and pins TRUE / 0. The exact tier is NOT a sort: money
# values have a bounded integer-cent domain, so exact quantiles come
# from a (flag, cents) histogram + cumulative window over DISTINCT
# cents — the classic scalable exact-quantile plan for discrete
# domains (the window is over the aggregated histogram, partitioned by
# flag, never over the raw corpus). Percentile convention, spelled out
# identically in both engines: rank k_p = ceil(p * n), value = min
# cents with cumulative count >= k_p — the SAME convention
# percentile_approx resolves to in exact mode (verified empirically at
# n = 5/10/76/101 for p in {.25,.5,.75,.99}), so on any group the
# sketch can fully summarize (n <= accuracy) the estimate is
# bit-equal to the exact value and the verdict is exact-by-identity;
# the 2% band only absorbs true GK rank error on large groups, never
# an off-by-one convention gap (which broke the fuzz probe's 76-row
# groups under the floor((n-1)p)+1 convention). All comparisons are
# long-integer, so no float-rounding divergence class applies.


def q33_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    # NULL prices are excluded from the percentile universe in BOTH
    # engines (and from n_rows, matching percentile_approx's own
    # NULL-skipping): without the mirrored filter, a NULL cents group
    # would sort FIRST in Spark's ASC window but LAST in DuckDB's,
    # silently shifting every cumulative rank.
    li = li.filter(F.col("l_extendedprice").isNotNull())
    cents = li.select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("c"),
    )
    hist = cents.groupBy("l_returnflag", "c").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("l_returnflag").orderBy("c")
    cum = hist.withColumn("cum", F.sum("cnt").over(w))
    # totals + the sketch come from one extra scan branch (the sketch
    # needs raw values; it cannot consume the weighted histogram)
    pcts = F.percentile_approx(
        "l_extendedprice", [0.25, 0.5, 0.75, 0.99], 10_000
    )
    tot = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(pcts[0] * 100).cast("long").alias("_a25"),
        F.round(pcts[1] * 100).cast("long").alias("_a50"),
        F.round(pcts[2] * 100).cast("long").alias("_a75"),
        F.round(pcts[3] * 100).cast("long").alias("_a99"),
    )
    j = cum.join(F.broadcast(tot), "l_returnflag")

    def _rank(pct_num: int):  # k_p = ceil(p*n) via integer arithmetic
        return F.floor((F.col("n_rows") * pct_num + 99) / 100)

    exact = j.groupBy("l_returnflag", "n_rows", "_a25", "_a50", "_a75", "_a99").agg(
        F.min(F.when(F.col("cum") >= _rank(25), F.col("c"))).alias("p25_cents"),
        F.min(F.when(F.col("cum") >= _rank(50), F.col("c"))).alias("p50_cents"),
        F.min(F.when(F.col("cum") >= _rank(75), F.col("c"))).alias("p75_cents"),
        F.min(F.when(F.col("cum") >= _rank(99), F.col("c"))).alias("p99_cents"),
    )
    withins, buckets = [], []
    for p in (25, 50, 75, 99):
        wv, bv = _sketch_verdict(
            F.col(f"_a{p}"), F.col(f"p{p}_cents"), tol_num=1, tol_den=50
        )
        withins.append(wv)
        buckets.append(bv)
    within_all = withins[0]
    for wv in withins[1:]:
        within_all = within_all & wv
    return exact.select(
        "l_returnflag",
        "n_rows",
        "p25_cents",
        "p50_cents",
        "p75_cents",
        "p99_cents",
        within_all.alias("gk_within_2pct"),
        F.greatest(*buckets).alias("gk_err_bucket"),
    )


_Q33_SQL = """
WITH cents AS (
  SELECT l_returnflag, CAST(round(l_extendedprice * 100) AS BIGINT) AS c
  FROM lineitem WHERE l_extendedprice IS NOT NULL
), hist AS (
  SELECT l_returnflag, c, count(*) AS cnt FROM cents GROUP BY 1, 2
), cum AS (
  SELECT l_returnflag, c,
         sum(cnt) OVER (PARTITION BY l_returnflag ORDER BY c) AS cum
  FROM hist
), tot AS (
  SELECT l_returnflag, count(*) AS n_rows FROM cents GROUP BY 1
)
SELECT t.l_returnflag,
       t.n_rows,
       min(CASE WHEN cum >= (t.n_rows * 25 + 99) // 100 THEN c END) AS p25_cents,
       min(CASE WHEN cum >= (t.n_rows * 50 + 99) // 100 THEN c END) AS p50_cents,
       min(CASE WHEN cum >= (t.n_rows * 75 + 99) // 100 THEN c END) AS p75_cents,
       min(CASE WHEN cum >= (t.n_rows * 99 + 99) // 100 THEN c END) AS p99_cents,
       TRUE              AS gk_within_2pct,
       CAST(0 AS BIGINT) AS gk_err_bucket
FROM cum JOIN tot t USING (l_returnflag)
GROUP BY t.l_returnflag, t.n_rows
"""


# --------------------------------------------------------------------------
# q31 — statistical aggregates: correlation, covariance, stddev,
# variance per group. Single hash aggregate; Spark and DuckDB both use
# streaming co-moment updates, so values agree to float64 precision
# and the 4 dp output rounding absorbs partial-order differences.


def q31_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.round(F.corr("l_quantity", "l_extendedprice"), 4) + F.lit(0.0)).alias(
            "corr_qty_price"
        ),
        (F.round(F.covar_samp("l_quantity", "l_discount"), 4) + F.lit(0.0)).alias(
            "covar_qty_disc"
        ),
        (F.round(F.stddev_samp("l_extendedprice"), 4) + F.lit(0.0)).alias(
            "std_price"
        ),
        (F.round(F.var_pop("l_discount"), 4) + F.lit(0.0)).alias("var_disc"),
    )


_Q31_SQL = """
SELECT l_returnflag,
       count(*) AS n_rows,
       round(corr(l_quantity, l_extendedprice), 4) + 0.0 AS corr_qty_price,
       round(covar_samp(l_quantity, l_discount), 4) + 0.0 AS covar_qty_disc,
       round(stddev_samp(l_extendedprice), 4) + 0.0 AS std_price,
       round(var_pop(l_discount), 4) + 0.0 AS var_disc
FROM lineitem
GROUP BY l_returnflag
"""


# --------------------------------------------------------------------------
# q32 — window VALUE functions (first/last/nth over an explicit
# frame): each customer's order history annotated with their first,
# latest-so-far, and second order price. last_value needs the frame
# spelled out (the default frame stops at CURRENT ROW); ties broken by
# o_orderkey so both engines pick identical rows.


def q32_window_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")["orders"]
    base = Window.partitionBy("o_custkey").orderBy(
        F.asc("o_orderdate"), F.asc("o_orderkey")
    )
    running = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    full = base.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.round(F.first_value("o_totalprice").over(running), 2).alias(
            "first_price"
        ),
        F.round(F.last_value("o_totalprice").over(running), 2).alias(
            "latest_price"
        ),
        F.round(F.nth_value("o_totalprice", 2).over(full), 2).alias(
            "second_price"
        ),
    )


_Q32_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(o_orderdate AS DATE) AS order_date,
       round(first_value(o_totalprice) OVER w_run, 2) AS first_price,
       round(last_value(o_totalprice) OVER w_run, 2) AS latest_price,
       round(nth_value(o_totalprice, 2) OVER w_full, 2) AS second_price
FROM orders
WINDOW
  w_run AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
  w_full AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


# --------------------------------------------------------------------------
# q34 — equi-width histogram (width_bucket shape): global min/max in a
# first pass, then every order binned into 10 equal-width buckets.
# Scale: the 1-row (min, max) aggregate broadcasts to the binning
# scan — two passes over the fact, no shuffle wider than the 10-row
# result. The bin arithmetic runs the identical IEEE double sequence
# on both engines (sub, div, mul, floor), so edges are deterministic.

_Q34_BINS = 10


def q34_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")["orders"]
    bounds = orders.agg(
        F.min("o_totalprice").alias("mn"), F.max("o_totalprice").alias("mx")
    )
    width = (F.col("mx") - F.col("mn")) / _Q34_BINS
    bin_ = F.least(
        F.lit(_Q34_BINS - 1),
        F.floor(
            (F.col("o_totalprice") - F.col("mn"))
            / (F.col("mx") - F.col("mn"))
            * _Q34_BINS
        ),
    )
    return (
        orders.crossJoin(F.broadcast(bounds))
        .select(
            bin_.cast("bigint").alias("bin"),
            "o_totalprice",
            (F.col("mn") + width * bin_).alias("lo"),
            (F.col("mn") + width * (bin_ + 1)).alias("hi"),
        )
        .groupBy("bin")
        .agg(
            F.round(F.min("lo"), 2).alias("bin_lo"),
            F.round(F.min("hi"), 2).alias("bin_hi"),
            F.count(F.lit(1)).alias("n_orders"),
            money_avg(F.col("o_totalprice"), 2, 2).alias("avg_price"),
        )
    )


_Q34_SQL = f"""
WITH b AS (SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx FROM orders),
binned AS (
  SELECT least({_Q34_BINS - 1},
               floor((o_totalprice - mn) / (mx - mn) * {_Q34_BINS}))::BIGINT AS bin,
         o_totalprice,
         mn + (mx - mn) / {_Q34_BINS}
            * least({_Q34_BINS - 1},
                    floor((o_totalprice - mn) / (mx - mn) * {_Q34_BINS})) AS lo,
         mn + (mx - mn) / {_Q34_BINS}
            * (least({_Q34_BINS - 1},
                     floor((o_totalprice - mn) / (mx - mn) * {_Q34_BINS})) + 1) AS hi
  FROM orders, b
)
SELECT bin, round(min(lo), 2) AS bin_lo, round(min(hi), 2) AS bin_hi,
       count(*) AS n_orders, {sql_money_avg('o_totalprice', 2, 2)} AS avg_price
FROM binned
GROUP BY bin
"""


# --------------------------------------------------------------------------
# q35 — UNPIVOT (melt): the wide→long inverse of e08's pivot. A wide
# per-flag aggregate unpivots into (flag, metric, value) rows — the
# shape every metrics sink / long-format exporter needs. Spark's
# native ``unpivot`` expands rows without a shuffle (the only exchange
# is the small upstream aggregate).


def q35_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    wide = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        money_avg(F.col("l_discount"), 2, 4).alias("avg_disc"),
    )
    return wide.unpivot(
        ["l_returnflag"], ["sum_qty", "sum_price", "avg_disc"], "metric", "value"
    )


_Q35_SQL = f"""
UNPIVOT (
  SELECT l_returnflag,
         round(sum(l_quantity), 2)      AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_price,
         {sql_money_avg('l_discount', 2, 4)} AS avg_disc
  FROM lineitem GROUP BY l_returnflag
)
ON sum_qty, sum_price, avg_disc
INTO NAME metric VALUE value
"""


# --------------------------------------------------------------------------
# q36 — keyed snapshot diff (month-over-month reload audit): the
# driver row for pipeline/validate.py::month_diff_summary — the
# set-ops motivation of SURVEY §2.2 ("TRUNCATE-then-load destroys
# history") exercised through the ONE shared helper, not a lookalike.
# Two snapshots are derived from orders by deterministic rules so all
# three change classes exist BY CONSTRUCTION (the d19/t13 injected-
# effect discipline): old = keys with pmod(k,97)!=0, new = keys with
# pmod(k,89)!=0 and the status flipped to 'X' where pmod(k,7)==0 —
# so added (97-multiples not 89-multiples), removed (89-multiples
# not 97-multiples), and changed (7-multiples present in both) are
# each non-empty on any non-trivial key range. The oracle computes
# ground-truth payload inequality directly; the Spark side's
# payload-hash full-outer join must agree exactly.


def q36_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rfb_data_pipeline_spark.pipeline.validate import (
        month_diff_summary,
    )

    orders = _t(spark, sf_dir, "orders")["orders"].select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    old = orders.filter(F.pmod(F.col("o_orderkey"), F.lit(97)) != 0)
    new = orders.filter(F.pmod(F.col("o_orderkey"), F.lit(89)) != 0).select(
        "o_orderkey",
        F.when(
            F.pmod(F.col("o_orderkey"), F.lit(7)) == 0, F.lit("X")
        )
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
        "o_totalprice",
    )
    return month_diff_summary(old, new, ["o_orderkey"]).orderBy("change")


_Q36_SQL = """
WITH old AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice
  FROM orders WHERE (o_orderkey % 97 + 97) % 97 <> 0
),
new AS (
  SELECT o_orderkey,
         CASE WHEN (o_orderkey % 7 + 7) % 7 = 0 THEN 'X'
              ELSE o_orderstatus END AS o_orderstatus,
         o_totalprice
  FROM orders WHERE (o_orderkey % 89 + 89) % 89 <> 0
),
diff AS (
  SELECT CASE WHEN o.o_orderkey IS NULL THEN 'added'
              WHEN n.o_orderkey IS NULL THEN 'removed'
              WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
              THEN 'changed' END AS change
  FROM old o FULL OUTER JOIN new n USING (o_orderkey)
)
SELECT change, count(*) AS n_entities
FROM diff WHERE change IS NOT NULL
GROUP BY change
ORDER BY change
"""


QUERIES = {
    "q01_pricing_summary": q01_pricing_summary,
    "q02_argmin_supplier": q02_argmin_supplier,
    "q03_topk_revenue": q03_topk_revenue,
    "q04_revenue_by_nation": q04_revenue_by_nation,
    "q05_region_revenue": q05_region_revenue,
    "q06_forecast_revenue": q06_forecast_revenue,
    "q07_semi_join": q07_semi_join,
    "q08_anti_join": q08_anti_join,
    "q09_topk_per_group": q09_topk_per_group,
    "q10_monthly_lag": q10_monthly_lag,
    "q11_rollup_report": q11_rollup_report,
    "q12_set_ops": q12_set_ops,
    "q13_string_functions": q13_string_functions,
    "q14_date_functions": q14_date_functions,
    "q15_conditional_agg": q15_conditional_agg,
    "q16_having": q16_having,
    "q17_distinct_agg": q17_distinct_agg,
    "q18_range_join": q18_range_join,
    "q19_cube": q19_cube,
    "q20_running_total": q20_running_total,
    "q21_rank_suppliers": q21_rank_suppliers,
    "q22_union_parts": q22_union_parts,
    "q23_median_stats": q23_median_stats,
    "q24_approx_distinct": q24_approx_distinct,
    "q25_collect_set": q25_collect_set,
    "q26_intersect": q26_intersect,
    "q27_above_nation_avg": q27_above_nation_avg,
    "q28_grouping_sets": q28_grouping_sets,
    "q29_ntile_percentile": q29_ntile_percentile,
    "q30_moving_range_sum": q30_moving_range_sum,
    "q31_stats_agg": q31_stats_agg,
    "q32_window_values": q32_window_values,
    "q33_approx_quantiles": q33_approx_quantiles,
    "q34_histogram": q34_histogram,
    "q35_unpivot": q35_unpivot,
    "q36_snapshot_diff": q36_snapshot_diff,
}

ORACLE = {
    "q01_pricing_summary": _Q01_SQL,
    "q02_argmin_supplier": _Q02_SQL,
    "q03_topk_revenue": _Q03_SQL,
    "q04_revenue_by_nation": _Q04_SQL,
    "q05_region_revenue": _Q05_SQL,
    "q06_forecast_revenue": _Q06_SQL,
    "q07_semi_join": _Q07_SQL,
    "q08_anti_join": _Q08_SQL,
    "q09_topk_per_group": _Q09_SQL,
    "q10_monthly_lag": _Q10_SQL,
    "q11_rollup_report": _Q11_SQL,
    "q12_set_ops": _Q12_SQL,
    "q13_string_functions": _Q13_SQL,
    "q14_date_functions": _Q14_SQL,
    "q15_conditional_agg": _Q15_SQL,
    "q16_having": _Q16_SQL,
    "q17_distinct_agg": _Q17_SQL,
    "q18_range_join": _Q18_SQL,
    "q19_cube": _Q19_SQL,
    "q20_running_total": _Q20_SQL,
    "q21_rank_suppliers": _Q21_SQL,
    "q22_union_parts": _Q22_SQL,
    "q23_median_stats": _Q23_SQL,
    "q24_approx_distinct": _Q24_SQL,
    "q25_collect_set": _Q25_SQL,
    "q26_intersect": _Q26_SQL,
    "q27_above_nation_avg": _Q27_SQL,
    "q28_grouping_sets": _Q28_SQL,
    "q29_ntile_percentile": _Q29_SQL,
    "q30_moving_range_sum": _Q30_SQL,
    "q31_stats_agg": _Q31_SQL,
    "q32_window_values": _Q32_SQL,
    "q33_approx_quantiles": _Q33_SQL,
    "q34_histogram": _Q34_SQL,
    "q35_unpivot": _Q35_SQL,
    "q36_snapshot_diff": _Q36_SQL,
}


# The r05-r07 bounds-oracle tier for q24/q33 is retired as of r08
# (VERDICT r07 item 1): both sketches now emit verdict columns
# (exact value + within-tolerance bool + integer error bucket) that
# the driver hash-checks directly, which strictly supersedes the
# local-only tolerance check. The checker hook remains (empty) so
# tools/check_oracle.py keeps working against older entry modules.
BOUNDS: dict[str, dict] = {}
