"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark at the given SF and the matching
``oracle_sql()`` on DuckDB over the same parquet, then compares
row-count, column names, and an order-insensitive value hash.

MIRRORS THE DRIVER (lesson of round 1, VERDICT.md "What's wrong" #5):

* The oracle side is materialized through **pandas** (``fetchdf``), not
  ``fetchall``.  DuckDB ``sum(INTEGER)`` returns HUGEINT, which pandas
  renders as *float64* (``8963.0``) while Spark returns int64
  (``8963``).  ``fetchall`` hands back Python ints and masked exactly
  this class of driver-red mismatch in round 1.
* Integer and float dtypes canonicalize **differently** (int ``8963``
  vs float ``8963.000000``), so an int-vs-float dtype skew is a FAIL
  here just as it is in the driver.
* List/array cells raise — the driver's pandas ``sort_values`` canon
  dies on them (``unhashable type: 'list'``, CORRECTNESS_r01 q25), so
  any query emitting arrays must stringify before it ships.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402


class UnhashableCell(TypeError):
    """A cell the driver's pandas canonicalizer cannot sort/hash."""


def _cell(v) -> str:
    # NaN/None first (pd.isna on arrays returns arrays — guard below).
    if v is None:
        return "NULL"
    # Date/timestamp: Spark DATE collects as datetime.date while DuckDB
    # fetchdf yields midnight datetime64 — the driver hashes those equal
    # (q03/q10/q20 were green in round 1), so canon midnight-naive
    # timestamps down to the date form.
    if isinstance(v, (pd.Timestamp, np.datetime64)) or (
        hasattr(v, "isoformat") and not isinstance(v, str)
    ):
        ts = pd.Timestamp(v)
        if ts is pd.NaT:
            return "NULL"
        if ts.tzinfo is None and ts == ts.normalize():
            return ts.strftime("%Y-%m-%d")
        return ts.isoformat(sep=" ")
    if isinstance(v, (list, tuple, dict, set, np.ndarray)):
        raise UnhashableCell(f"unhashable cell type {type(v).__name__}: driver canon would crash")
    if isinstance(v, (float, np.floating)):
        if v != v:
            return "NaN"
        # fixed form WITH trailing zeros so float64 8963.0 -> "8963.000000"
        # stays distinct from int64 8963 -> "8963" (the driver distinguishes).
        return f"{float(v):.6f}"
    if isinstance(v, (bool, np.bool_)):
        return str(int(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if pd.isna(v):
        return "NULL"
    return str(v)


def _normalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = [tuple(_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    out.sort()
    return out


def check_bounds(con, spdf: pd.DataFrame, spec: dict) -> list[str]:
    """Tolerance gate for approximate sketches: every Spark estimate
    must land within ``rel_tol`` of DuckDB's EXACT value (keyed join),
    and ``exact`` columns must match exactly. Returns problem strings
    (empty = pass)."""
    exact_df = con.execute(spec["sql"]).fetchdf()
    key = spec["key"]
    errs = []
    if len(spdf) != len(exact_df):
        errs.append(f"rowcount spark={len(spdf)} exact={len(exact_df)}")
        return errs
    merged = spdf.merge(exact_df, on=key, suffixes=("", "_exact"))
    if len(merged) != len(spdf):
        errs.append("key mismatch between spark and exact frames")
        return errs
    for col in spec.get("exact", ()):
        bad = merged[merged[col] != merged[f"{col}_exact"]]
        if len(bad):
            r = bad.iloc[0]
            errs.append(
                f"{col} exact mismatch at {[r[k] for k in key]}: "
                f"spark={r[col]} exact={r[f'{col}_exact']}"
            )
    for col, tol in spec.get("rel_tol", {}).items():
        a = merged[col].astype(float)
        b = merged[f"{col}_exact"].astype(float)
        rel = (a - b).abs() / np.maximum(b.abs(), 1.0)
        if (rel > tol).any():
            i = int(rel.idxmax())
            errs.append(
                f"{col} outside {tol:.0%} at "
                f"{[merged.loc[i, k] for k in key]}: "
                f"spark={a[i]} exact={b[i]} rel={rel[i]:.4f}"
            )
    return errs


def value_hash(norm: list[tuple]) -> str:
    h = hashlib.sha256()
    for row in norm:
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e

    if os.environ.get("ORACLE_BARE_SESSION") == "1":
        # The driver's environment: a SparkSession with NO repo confs
        # (no UTC session TZ, no AQE tuning). Queries must be correct
        # here too — any session-dependent conf has to be applied at
        # runtime inside catalog/source code, not in get_spark.
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[4]")
            .appName("oracle-check-bare")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        from rfb_data_pipeline_spark.session import get_spark

        spark = get_spark("oracle-check")
    qs, oracles = e.queries(), e.oracle_sql()
    bounds = getattr(e, "bounds_oracle", dict)()

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    n_pass = n_fail = 0
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception:
            print(f"FAIL {name}: spark error")
            traceback.print_exc()
            n_fail += 1
            continue
        if name not in oracles:
            try:
                _normalize(spdf)  # arrays crash the driver even rows-only? be strict anyway
            except UnhashableCell as exc:
                print(f"FAIL {name}: {exc}")
                n_fail += 1
                continue
            if name in bounds:
                errs = check_bounds(con, spdf, bounds[name])
                if errs:
                    print(f"FAIL {name}: bounds: " + "; ".join(errs))
                    n_fail += 1
                    continue
                print(
                    f"pass {name}: rows-only + bounds "
                    f"({len(spdf)} rows, {time.time()-t0:.1f}s)"
                )
            else:
                print(
                    f"pass {name}: rows-only "
                    f"({len(spdf)} rows, {time.time()-t0:.1f}s)"
                )
            n_pass += 1
            continue
        try:
            opdf = con.execute(oracles[name]).fetchdf()
        except Exception:
            print(f"FAIL {name}: duckdb error")
            traceback.print_exc()
            n_fail += 1
            continue
        problems = []
        if len(spdf) != len(opdf):
            problems.append(f"rowcount spark={len(spdf)} duckdb={len(opdf)}")
        if sorted(spdf.columns) != sorted(opdf.columns):
            problems.append(
                f"cols spark={sorted(spdf.columns)} duckdb={sorted(opdf.columns)}"
            )
        else:
            try:
                sn, on = _normalize(spdf), _normalize(opdf)
            except UnhashableCell as exc:
                problems.append(str(exc))
            else:
                if value_hash(sn) != value_hash(on):
                    problems.append("value-hash mismatch")
                    for a, b in list(zip(sn, on))[:500]:
                        if a != b:
                            problems.append(f"  first diff: spark={a} duckdb={b}")
                            break
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"pass {name} ({len(spdf)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
