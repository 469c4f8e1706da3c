"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark at the given SF and the matching
``oracle_sql()`` on DuckDB over the same parquet, then compares
row-count, column names, and an order-insensitive value hash
(columns sorted by name, rows sorted by their string form).

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


def _normalize(rows: list[dict], cols: list[str]) -> list[tuple]:
    def cell(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            # mirror a tolerant driver: fixed decimal form
            if v != v:  # NaN
                return "NaN"
            return f"{v:.6f}".rstrip("0").rstrip(".")
        if isinstance(v, bool):
            return str(int(v))
        if isinstance(v, (list, tuple)):
            return "[" + ",".join(cell(x) for x in v) + "]"
        return str(v)

    out = [tuple(cell(r[c]) for c in cols) for r in rows]
    out.sort()
    return out


def value_hash(rows: list[dict], cols: list[str]) -> str:
    h = hashlib.sha256()
    for row in _normalize(rows, cols):
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from rfb_data_pipeline_spark.session import get_spark

    spark = get_spark("oracle-check")
    qs, oracles = e.queries(), e.oracle_sql()

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
            scols = sdf.columns
            srows = [r.asDict() for r in sdf.collect()]
        except Exception:
            print(f"FAIL {name}: spark error")
            traceback.print_exc()
            n_fail += 1
            continue
        if name not in oracles:
            print(f"pass {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1
            continue
        try:
            rel = con.execute(oracles[name])
            ocols = [d[0] for d in rel.description]
            orows = [dict(zip(ocols, r)) for r in rel.fetchall()]
        except Exception:
            print(f"FAIL {name}: duckdb error")
            traceback.print_exc()
            n_fail += 1
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} duckdb={sorted(ocols)}")
        else:
            cols = sorted(scols)
            sh, oh = value_hash(srows, cols), value_hash(orows, cols)
            if sh != oh:
                problems.append("value-hash mismatch")
                sn, on = _normalize(srows, cols), _normalize(orows, cols)
                for a, b in list(zip(sn, on))[:200]:
                    if a != b:
                        problems.append(f"  first diff: spark={a} duckdb={b}")
                        break
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"pass {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
