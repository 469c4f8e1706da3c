"""The q24/q33 sketch-verdict tier (r08, VERDICT r07 item 1).

Both sketch queries emit verdict columns — the exact value (long,
bit-portable) plus ``*_within_*`` / ``*_err_bucket`` computed
Spark-side from the live sketch against the live exact value — and
the DuckDB twin pins the expected literals (TRUE / 0). These tests
prove the verdict is NOT vacuous: the boolean really flips and the
bucket really grows when an estimate drifts out of tolerance, and the
real sketches land comfortably inside their bands at fixture scale.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from rfb_data_pipeline_spark.operators.relational import (
    _sketch_verdict,
    q24_approx_distinct,
    q33_approx_quantiles,
)
from tests.conftest import SF_SMALL


def test_verdict_flips_out_of_tolerance(spark):
    # (approx, exact) fixtures straddling the 5% band (tol 1/20)
    rows = [
        (100, 100),   # spot-on -> within, bucket 0
        (104, 100),   # 4% err  -> within, bucket 0
        (105, 100),   # exactly 5% -> boundary counts as within
        (106, 100),   # 6% err  -> NOT within, bucket 1
        (150, 100),   # 50% err -> bucket 10
        (0, 0),       # degenerate group: guard divides by max(exact,1)
    ]
    df = spark.createDataFrame(rows, "approx long, exact long")
    within, bucket = _sketch_verdict(
        F.col("approx"), F.col("exact"), tol_num=1, tol_den=20
    )
    got = df.select(
        "approx", within.alias("w"), bucket.alias("b")
    ).orderBy("approx").collect()
    by_approx = {r["approx"]: (r["w"], r["b"]) for r in got}
    assert by_approx[100] == (True, 0)
    assert by_approx[104] == (True, 0)
    # boundary-exact estimate: within AND bucket 0 — the two columns
    # can never contradict (ADVICE r08 #1; used to be (True, 1))
    assert by_approx[105] == (True, 0)
    assert by_approx[106] == (False, 1)
    assert by_approx[150] == (False, 10)
    assert by_approx[0] == (True, 0)


def test_q24_verdict_green_and_exact(spark):
    pdf = q24_approx_distinct(spark, SF_SMALL).toPandas()
    assert len(pdf) == 3
    assert pdf["hll_within_5pct"].all()
    assert (pdf["hll_err_bucket"] == 0).all()
    # exact side really is exact (independent pandas recount)
    li = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet",
                         columns=["l_returnflag", "l_orderkey"])
    want = li.groupby("l_returnflag")["l_orderkey"].nunique()
    got = pdf.set_index("l_returnflag")["exact_orders"]
    assert got.sort_index().tolist() == want.sort_index().tolist()


def test_q33_verdict_green_and_exact(spark):
    pdf = q33_approx_quantiles(spark, SF_SMALL).toPandas()
    assert len(pdf) == 3
    assert pdf["gk_within_2pct"].all()
    assert (pdf["gk_err_bucket"] == 0).all()
    # exact discrete percentile convention, recomputed in pandas:
    # k_p = ceil(p*n) (percentile_approx's own exact-mode rank, so
    # small groups verdict exactly); value = k_p-th smallest cent
    li = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet",
                         columns=["l_returnflag", "l_extendedprice"])
    li["c"] = (li["l_extendedprice"] * 100).round().astype("int64")
    for flag, grp in li.groupby("l_returnflag"):
        cs = grp["c"].sort_values().to_numpy()
        n = len(cs)
        row = pdf[pdf["l_returnflag"] == flag].iloc[0]
        assert row["n_rows"] == n
        for p, col in ((25, "p25_cents"), (50, "p50_cents"),
                       (75, "p75_cents"), (99, "p99_cents")):
            k = (n * p + 99) // 100
            assert row[col] == cs[k - 1], (flag, col)


def test_bounds_tier_retired():
    import __spark_entry__ as e

    assert e.bounds_oracle() == {}


def test_q24_null_keys_mirrored(spark, tmp_path):
    """NULL l_orderkey must be skipped by the exact-distinct tier
    IDENTICALLY to count(DISTINCT) and approx_count_distinct (both
    skip NULLs) while n_rows stays count(*) over all rows — ADVICE
    r08 #2's latent off-by-one, probed on a NULL-heavy fixture."""
    import duckdb

    from rfb_data_pipeline_spark.operators.relational import _Q24_SQL

    rows = []
    for i in range(600):
        flag = "ANR"[i % 3]
        key = None if i % 7 == 0 else (i * 11) % 140
        rows.append((flag, key))
    df = spark.createDataFrame(rows, "l_returnflag string, l_orderkey long")
    fx = str(tmp_path / "lineitem.parquet")
    df.coalesce(1).write.parquet(fx)

    got = {
        r["l_returnflag"]: r.asDict()
        for r in q24_approx_distinct(spark, str(tmp_path)).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{fx}/*.parquet')"
    )
    want = {r[0]: r for r in con.execute(_Q24_SQL).fetchall()}
    assert set(got) == set(want) == {"A", "N", "R"}
    for flag, r in got.items():
        w = want[flag]
        assert r["exact_orders"] == w[1], flag   # NULL group not counted
        assert r["n_rows"] == w[2] == 200, flag  # but count(*) keeps it
        assert r["hll_within_5pct"] and r["hll_err_bucket"] == 0, flag
    # the fixture is non-vacuous: NULL keys really exist per flag
    assert all(r["n_rows"] > r["exact_orders"] for r in got.values())


def test_q33_null_prices_mirrored(spark, tmp_path):
    """NULL l_extendedprice must be excluded from the percentile
    universe IDENTICALLY in both engines (Spark windows sort NULLS
    FIRST ASC, DuckDB LAST — unfiltered NULLs would shift every
    cumulative rank). Differential probe over a NULL-heavy fixture."""
    import duckdb

    from rfb_data_pipeline_spark.operators.relational import (
        q33_approx_quantiles,
        _Q33_SQL,
    )

    rows = []
    for i in range(300):
        flag = "ANR"[i % 3]
        price = None if i % 5 == 0 else float(100 + (i * 37) % 9000) + 0.25
        rows.append((flag, price))
    df = spark.createDataFrame(rows, "l_returnflag string, l_extendedprice double")
    fx = str(tmp_path / "lineitem.parquet")
    df.coalesce(1).write.parquet(fx)

    got = {
        r["l_returnflag"]: r.asDict()
        for r in q33_approx_quantiles(spark, str(tmp_path)).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{fx}/*.parquet')"
    )
    want = {
        r[0]: r for r in con.execute(_Q33_SQL).fetchall()
    }
    assert set(got) == set(want) == {"A", "N", "R"}
    for flag, r in got.items():
        w = want[flag]
        # column order in _Q33_SQL: flag, n_rows, p25..p99, bool, bucket
        assert r["n_rows"] == w[1] == 80  # 100 rows/flag, 20 NULLs gone
        assert (r["p25_cents"], r["p50_cents"], r["p75_cents"],
                r["p99_cents"]) == (w[2], w[3], w[4], w[5]), flag
        assert r["gk_within_2pct"] and r["gk_err_bucket"] == 0, flag
