"""Parallel-scaling evidence at a bigger corpus (VERDICT r13 item 5).

At sf0.1 (~11 MB inputs) every query is scheduling-bound and 8 cores
BEAT 32 (BENCH_r13 vs BENCH_r13_c8) — the bench cannot demonstrate the
100 TB posture. This probe times the six scale-sensitive rows (s06,
d10, d03, d20, g05, e03) on the deterministic 10x fixture that
tools/scale_check.py derives from sf0.1 (replica suffixing/sign-flips:
within-replica duplicate/pair structure preserved, cross-replica
disjoint, so total work multiplies cleanly) at the CURRENT
$SPARK_GRAFT_CPUS, and merges the numbers into SCALING_x10.json.

Run it once per core count; the file accumulates one block per count
and, when both 8 and 32 are present, a ratio table (t8/t32 — ~1 means
scheduling-bound, >=2 means the operator actually uses the cores):

    SPARK_GRAFT_CPUS=32 python tools/scaling_probe.py
    SPARK_GRAFT_CPUS=8  python tools/scaling_probe.py

bench.py embeds SCALING_x10.json (when present) into BENCH_local.json
as "scaling_x10", so the record rides along with the bench detail.
Each run computes everything from the parquet fixture — nothing is
reused across invocations except the fixture FILES themselves, which
are inputs (deterministically derived from /root/testdata/sf0.1),
never query results.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = (
    "s06_near_dup_pairs_banded",
    "d10_fuzzy_pairs",
    "d03_minhash_lsh",
    "d20_incremental_span_dedup",
    "g05_graph_summary",
    "e03_sessionize",
)

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "SCALING_x10.json",
)


def main() -> None:
    mult = 10
    for a in sys.argv[1:]:
        if a.startswith("--mult="):
            mult = int(a.split("=", 1)[1])

    from rfb_data_pipeline_spark.session import get_spark

    import __spark_entry__ as entry_mod
    from tools import scale_check

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark("rfb-scaling-probe")
    sf_dir = scale_check.build_fixture(spark, mult)
    qs = entry_mod.queries()

    # noop sink, NOT collect (guide §1.4): at 10x some result sets are
    # large (e03 emits ~1M sessions) and collect() times py4j row
    # serialization to the driver, which is core-count-independent —
    # measured 0.7 s noop vs 8.6 s collect for BOTH e03 shapes at 10x.
    def _run(name: str) -> None:
        qs[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    result: dict[str, dict] = {}
    for name in ROWS:
        t0 = time.time()
        _run(name)  # warmup: memo builds land here
        first = time.time() - t0
        runs: list[float] = []
        for _ in range(3):
            t0 = time.time()
            _run(name)
            runs.append(time.time() - t0)
        result[name] = {
            "min": round(min(runs), 3),
            "med": round(sorted(runs)[1], 3),
            "first_run_incl_memos": round(first, 3),
        }

    blob: dict = {}
    if os.path.exists(OUT):
        with open(OUT) as fh:
            blob = json.load(fh)
    blob["mult"] = mult
    blob["base_sf"] = 0.1
    blob[f"cpus{cpus}"] = {
        "load_avg": [round(x, 2) for x in os.getloadavg()],
        "queries": result,
    }
    lo, hi = blob.get("cpus8"), blob.get("cpus32")
    if lo and hi:
        blob["ratio_t8_over_t32"] = {
            n: round(lo["queries"][n]["min"] / hi["queries"][n]["min"], 2)
            for n in ROWS
            if n in lo["queries"] and n in hi["queries"]
        }
    with open(OUT, "w") as fh:
        json.dump(blob, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps({f"cpus{cpus}": result}))


if __name__ == "__main__":
    main()
