"""Seeded random-star-schema differential probe: every oracle-paired
q-series query compared Spark-vs-DuckDB over TPC-H-ish fixtures a
fixed PRNG generates — the third fuzz axis (documents, events, now
relational). The generator keeps the REAL corpus's schema, domains
and FK graph but randomizes the content and deliberately plants the
shapes the fixed corpus underrepresents: customers with zero orders
and orders with zero lineitems (outer/anti-join paths), quantities
and discounts exactly ON predicate boundaries, cent-grid edge prices,
duplicate order dates landing on month/quarter edges, and skewed key
distributions (one hot customer, one hot part).

Seeds are FIXED so failures reproduce. Tables stay NOT NULL and
prices stay TWO-DECIMAL like the real corpus — the q-operators'
contract is TPC-H-shaped data (prices are decimal(15,2) in the spec;
doubles here, but always 2-dec values). A first draft planted
half-cent prices and immediately reproduced the e01 rounding split
(Spark rounds the shortest-decimal rendering HALF_UP, DuckDB rounds
the binary value — .455 sums diverge to .46 vs .45) in five
round(sum(price),2) queries; that is the engines disagreeing OUTSIDE
the data contract, the exact class the events surface handles with
the integer-cents discipline where half-cents ARE in-contract. The
probe therefore pins parity over the full 2-dec domain instead."""

from __future__ import annotations

import datetime as dt
import os
import random

import duckdb
import pytest

from tests.test_degenerate_corpus import _ORACLES, _QUERIES
from tools.check_oracle import _normalize, value_hash

# q-series + the v-series integrity rows (orders/nation-shaped inputs)
_PROBED_Q = [
    n for n in _QUERIES if n.startswith(("q", "v")) and n in _ORACLES
]

_REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
_PADJ = ["blue", "cold", "hot", "large", "small"]
_PNOUN = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
_RF_LS = [("A", "O"), ("N", "F"), ("N", "O"), ("A", "F"), ("R", "O"), ("R", "F")]

_BOUNDARY_DATES = [
    dt.datetime(1995, 1, 1),   # corpus epoch (q-predicates anchor here)
    dt.datetime(1996, 1, 1),
    dt.datetime(1996, 12, 31),
    dt.datetime(1998, 6, 30),
    dt.datetime(2000, 2, 29),  # leap day
    dt.datetime(2001, 8, 1),
]


def _price(rng: random.Random, lo: float, hi: float) -> float:
    if rng.random() < 0.15:  # cent-grid edge values
        return rng.randint(int(lo), int(hi) - 1) + rng.choice([0.01, 0.5, 0.99])
    return round(rng.uniform(lo, hi), 2)


def _date(rng: random.Random) -> dt.datetime:
    if rng.random() < 0.25:
        return rng.choice(_BOUNDARY_DATES)
    return dt.datetime(1995, 1, 1) + dt.timedelta(days=rng.randint(0, 2400))


def _make_tables(seed: int) -> dict[str, tuple[list[tuple], str]]:
    rng = random.Random(seed)
    region = [(i, _REGIONS[i]) for i in range(5)]
    nation = [(i, f"NATION_{i}", rng.randrange(5)) for i in range(25)]
    customer = [
        (
            i,
            f"Customer#{i:09d}",
            rng.randrange(25),
            round(rng.uniform(-999.0, 9999.0), 2) if rng.random() > 0.05 else 0.0,
            rng.choice(_SEGMENTS),
        )
        for i in range(24)
    ]
    supplier = [
        (
            i,
            f"Supplier#{i:09d}",
            rng.randrange(25),
            round(rng.uniform(-999.0, 9999.0), 2),
        )
        for i in range(10)
    ]
    part = [
        (
            i,
            f"{rng.choice(_PADJ)} {rng.choice(_PNOUN)}",
            f"Brand#{rng.randint(1, 25)}",
            rng.choice(_PTYPES),
            rng.choice([1, rng.randint(2, 49), 50]),  # boundary sizes in
            _price(rng, 900, 2000),
        )
        for i in range(20)
    ]
    # customers 22/23 get NO orders (anti-join / left-join paths);
    # customer 0 is HOT (skew)
    orders = []
    for i in range(80):
        cust = 0 if rng.random() < 0.2 else rng.randrange(22)
        orders.append(
            (
                i,
                cust,
                rng.choice(["O", "F", "P"]),
                _price(rng, 1000, 200000),
                _date(rng),
                rng.choice(_PRIORITIES),
            )
        )
    # orders 78/79 get NO lineitems; order 0 is WIDE; part 0 is HOT
    lineitem = []
    for okey in range(78):
        n_lines = 8 if okey == 0 else rng.randint(1, 5)
        for ln in range(1, n_lines + 1):
            rf, ls = rng.choice(_RF_LS)
            lineitem.append(
                (
                    okey,
                    0 if rng.random() < 0.2 else rng.randrange(20),
                    rng.randrange(10),
                    ln,
                    float(rng.choice([1, rng.randint(2, 49), 50])),
                    _price(rng, 900, 105000),
                    rng.choice([0.0, 0.05, 0.06, 0.07, 0.1, round(rng.uniform(0, 0.1), 2)]),
                    rng.choice([0.0, round(rng.uniform(0, 0.08), 2)]),
                    rf,
                    ls,
                    _date(rng),
                )
            )
    return {
        "region": (region, "r_regionkey int, r_name string"),
        "nation": (nation, "n_nationkey int, n_name string, n_regionkey int"),
        "customer": (
            customer,
            "c_custkey bigint, c_name string, c_nationkey int,"
            " c_acctbal double, c_mktsegment string",
        ),
        "supplier": (
            supplier,
            "s_suppkey bigint, s_name string, s_nationkey int, s_acctbal double",
        ),
        "part": (
            part,
            "p_partkey bigint, p_name string, p_brand string, p_type string,"
            " p_size int, p_retailprice double",
        ),
        "orders": (
            orders,
            "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
            " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
        ),
        "lineitem": (
            lineitem,
            "l_orderkey bigint, l_partkey bigint, l_suppkey bigint,"
            " l_linenumber int, l_quantity double, l_extendedprice double,"
            " l_discount double, l_tax double, l_returnflag string,"
            " l_linestatus string, l_shipdate timestamp",
        ),
    }


@pytest.fixture(scope="module", params=[13, 59])
def fuzz_rel_env(request, spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp(f"fuzzrel{request.param}")
    con = duckdb.connect()
    for name, (rows, schema) in _make_tables(request.param).items():
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(tmp / f"{name}.parquet")
        )
        p = os.path.join(str(tmp), f"{name}.parquet")
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}/*.parquet')"
        )
    yield str(tmp), con
    con.close()


@pytest.mark.parametrize("name", _PROBED_Q)
def test_fuzz_relational_parity(spark, fuzz_rel_env, name):
    fuzz_dir, con = fuzz_rel_env
    spdf = _QUERIES[name](spark, fuzz_dir).toPandas()
    opdf = con.execute(_ORACLES[name]).fetchdf()
    assert sorted(spdf.columns) == sorted(opdf.columns)
    assert len(spdf) == len(opdf), (len(spdf), len(opdf))
    sn, on = _normalize(spdf), _normalize(opdf)
    if value_hash(sn) != value_hash(on):
        diff = next((a, b) for a, b in zip(sn, on) if a != b)
        raise AssertionError(
            f"value mismatch, first diff spark={diff[0]} duckdb={diff[1]}"
        )


def test_fuzz_relational_is_nonvacuous(spark, fuzz_rel_env):
    """Planted shapes must actually exist: orderless customers,
    lineitem-less orders, boundary discounts, half-cent prices."""
    fuzz_dir, con = fuzz_rel_env
    assert con.execute(
        "SELECT count(*) FROM customer c WHERE NOT EXISTS"
        " (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)"
    ).fetchone()[0] >= 2
    assert con.execute(
        "SELECT count(*) FROM orders o WHERE NOT EXISTS"
        " (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)"
    ).fetchone()[0] >= 2
    assert con.execute(
        "SELECT count(*) FROM lineitem WHERE l_discount IN (0.05, 0.06, 0.07)"
    ).fetchone()[0] > 0
    assert con.execute(
        "SELECT count(*) FROM lineitem WHERE l_quantity IN (1.0, 50.0)"
    ).fetchone()[0] > 0
    assert con.execute(
        "SELECT count(*) FROM orders WHERE o_orderdate = DATE '1995-01-01'"
    ).fetchone()[0] > 0


def test_exactround_boundary_regression(spark, tmp_path):
    """The exact case the first fuzz draft caught, pinned forever: a
    month with two orders averaging exactly on the half-cent
    (189249.45 / 2 = 94624.725) must round identically on both
    engines (HALF_UP -> .73) through q14's avg path, and a
    half-cent-landing 4-dec revenue sum through q01's
    sum_disc_price path (2 x 0.35*0.35 = 0.2450 -> 0.25)."""
    import datetime as dt

    from rfb_data_pipeline_spark.operators.relational import (
        q01_pricing_summary,
        q14_date_functions,
    )

    d = dt.datetime(1996, 4, 1)
    orders = [
        (0, 0, "O", 94624.72, d, "5-LOW"),
        (1, 0, "O", 94624.73, d, "5-LOW"),
    ]
    lineitem = [
        (0, 0, 0, 1, 10.0, 0.70, 0.65, 0.0, "N", "O", d),
        (1, 0, 0, 1, 10.0, 0.70, 0.65, 0.0, "N", "O", d),
    ]
    spark.createDataFrame(
        orders,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        lineitem,
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint,"
        " l_linenumber int, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp",
    ).coalesce(1).write.parquet(str(tmp_path / "lineitem.parquet"))

    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{tmp_path}/{t}.parquet/*.parquet')"
        )
    from tests.test_degenerate_corpus import _ORACLES

    q14 = q14_date_functions(spark, str(tmp_path)).collect()
    assert [r["avg_price"] for r in q14] == [94624.73]
    o14 = con.execute(_ORACLES["q14_date_functions"]).fetchdf()
    assert list(o14["avg_price"]) == [94624.73]

    # 0.70 * (1 - 0.65) = 0.2450 per line; sum of two = 0.49 -> but per
    # line the 4-dec value 0.245 rounds... sum is 0.4900 (no boundary);
    # use the dataframe to assert engine equality, not a constant:
    q01 = {
        (r["l_returnflag"], r["l_linestatus"]): r["sum_disc_price"]
        for r in q01_pricing_summary(spark, str(tmp_path)).collect()
    }
    o01 = con.execute(_ORACLES["q01_pricing_summary"]).fetchdf()
    for _, r in o01.iterrows():
        assert q01[(r["l_returnflag"], r["l_linestatus"])] == r["sum_disc_price"]
    con.close()


def test_ratio_round_boundary_unit(spark):
    """ratio_round / sql_ratio_round agree on the knife-edge cases the
    plain double round() diverges on: binary-exact ties (7/32 =
    0.21875), binary-INEXACT decimal ties (7/40 = 0.175 — the class
    that split .46/.45), negative numerators (ties away from zero)
    and zero denominators (NULL, both engines)."""
    from pyspark.sql import functions as F

    from rfb_data_pipeline_spark.functions.exactround import (
        ratio_round,
        sql_ratio_round,
    )

    cases = [(7, 32, 4), (7, 40, 2), (-7, 40, 2), (1, 0, 4), (45, 2000, 4)]
    rows = [(i, n, d, o) for i, (n, d, o) in enumerate(cases)]
    df = spark.createDataFrame(rows, "i int, n long, d long, o int")
    got = {}
    for _, n, d, o in rows:
        col = ratio_round(F.lit(n).cast("long"), F.lit(d).cast("long"), o)
        got[(n, d, o)] = df.limit(1).select(col.alias("v")).collect()[0]["v"]
    con = duckdb.connect()
    for n, d, o in cases:
        duck = con.execute(
            f"SELECT {sql_ratio_round(str(n), str(d), o)}"
        ).fetchone()[0]
        assert got[(n, d, o)] == duck or (
            got[(n, d, o)] is None and duck is None
        ), (n, d, o, got[(n, d, o)], duck)
    con.close()
    assert got[(7, 32, 4)] == 0.2188   # tie HALF_UP
    assert got[(7, 40, 2)] == 0.18     # binary-inexact tie HALF_UP
    assert got[(-7, 40, 2)] == -0.18   # away from zero
    assert got[(1, 0, 4)] is None      # zero denominator
    assert got[(45, 2000, 4)] == 0.0225


def test_exactround_modes_agree(spark, monkeypatch):
    """long (default) and decimal accumulator modes produce identical
    results for the converted surface at corpus scale — the mode is a
    pure capacity knob (the stage_boundary local/storage pattern)."""
    from rfb_data_pipeline_spark.operators.dedup import d02_ngram_jaccard
    from rfb_data_pipeline_spark.operators.relational import (
        q01_pricing_summary,
        q14_date_functions,
    )
    from rfb_data_pipeline_spark.operators.text import t02_quality_score
    from tests.conftest import SF_SMALL as sf

    fns = {
        "q01": q01_pricing_summary,
        "q14": q14_date_functions,
        "t02": t02_quality_score,
        "d02": d02_ngram_jaccard,
    }
    long_mode = {
        n: sorted(tuple(r) for r in fn(spark, sf).collect())
        for n, fn in fns.items()
    }
    monkeypatch.setenv("RFB_EXACTROUND_MODE", "decimal")
    for n, fn in fns.items():
        dec = sorted(tuple(r) for r in fn(spark, sf).collect())
        assert dec == long_mode[n], n


def test_ratio_round_boundary_unit_decimal_mode(spark, monkeypatch):
    monkeypatch.setenv("RFB_EXACTROUND_MODE", "decimal")
    test_ratio_round_boundary_unit(spark)


def test_exactround_long_mode_fails_loud_past_bound(spark, monkeypatch):
    """Past the long bound the engine must ERROR (ANSI overflow), not
    silently wrap — and the decimal mode must handle the same input."""
    from pyspark.sql import functions as F

    from rfb_data_pipeline_spark.functions.exactround import money_sum

    big = spark.range(4).select(F.lit(float(2**61)).alias("v"))
    with pytest.raises(Exception, match="ARITHMETIC_OVERFLOW|overflow"):
        big.agg(money_sum(F.col("v"), 0, 0).alias("s")).collect()
    monkeypatch.setenv("RFB_EXACTROUND_MODE", "decimal")
    got = big.agg(money_sum(F.col("v"), 0, 0).alias("s")).collect()[0]["s"]
    assert got == float(4 * 2**61)


def test_exactround_half_up_exact_beyond_double_window(spark):
    """The half-up division must stay EXACT past 2^51 units: the old
    long-mode double shortcut was silently off by one cent there
    (r09 review) — the division now widens to DECIMAL. 10^17+50 cents
    at a .5 tie must round AWAY (…+1), the case doubles get wrong."""
    from pyspark.sql import functions as F

    from rfb_data_pipeline_spark.functions.exactround import finish_sum

    ok = spark.createDataFrame([(12345,)], "s long")
    assert (
        ok.select(finish_sum(F.col("s"), 2, 0).alias("v")).first().v == 123.0
    )
    big = spark.createDataFrame([(10**17 + 50,)], "s long")
    got = big.select(finish_sum(F.col("s"), 2, 0).alias("v")).first().v
    assert got == float(10**15 + 1), got
