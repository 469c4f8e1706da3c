"""Ad-hoc per-query timing: bench.py's methodology (page-cache warm,
q01 JVM warm, timed base builds, then min/median of N reps) for an
arbitrary subset of registered queries, so an optimization loop can
re-measure its target in seconds instead of re-running the full
76-query headline bench.

Usage: python tools/qbench.py [-nN] query [query ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.

Prints one JSON line {"queries": {name: min}, "queries_median": {...},
"bases": {...}} — same semantics as the corresponding BENCH_local.json
fields. Never writes BENCH_local.json.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    reps = 3
    names = []
    for a in sys.argv[1:]:
        if a.startswith("-n"):
            reps = int(a[2:])
        else:
            names.append(a)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from rfb_data_pipeline_spark.session import get_spark

    # bench BEFORE __spark_entry__: the entry module prepends
    # /root/repo to sys.path, which would shadow a scratch worktree's
    # own bench.py and mix two source trees in one process.
    import bench
    import __spark_entry__ as entry_mod

    spark = get_spark("rfb-qbench")
    qs = entry_mod.queries()
    for p in sorted(glob.glob(os.path.join(sf_dir, "**", "*.parquet"), recursive=True)):
        if os.path.isfile(p):
            with open(p, "rb") as fh:
                while fh.read(1 << 22):
                    pass
    qs["q01_pricing_summary"](spark, sf_dir).collect()

    bases: dict[str, float] = {}
    for bname, build in bench.base_builders(spark, sf_dir).items():
        t0 = time.time()
        build()
        bases[bname] = round(time.time() - t0, 3)

    mins: dict[str, float] = {}
    meds: dict[str, float] = {}
    jobs: dict[str, int] = {}
    tracker = spark.sparkContext.statusTracker()
    for name in names:
        runs = []
        for rep in range(reps):
            # Spark job count per rep via a job group: deterministic
            # (load-independent), so before/after comparisons survive
            # host-throttling noise that makes wall seconds swing 3x.
            group = f"qbench:{name}:{rep}"
            spark.sparkContext.setJobGroup(group, name)
            t0 = time.time()
            qs[name](spark, sf_dir).collect()
            runs.append(time.time() - t0)
            spark.sparkContext.setJobGroup(None, None)
            jobs[name] = len(tracker.getJobIdsForGroup(group))
        mins[name] = round(min(runs), 3)
        meds[name] = round(sorted(runs)[len(runs) // 2], 3)
    print(
        json.dumps(
            {
                "queries": mins,
                "queries_median": meds,
                "queries_jobs": jobs,
                "total_min": round(sum(mins.values()), 3),
                "bases": bases,
                "bases_total": round(sum(bases.values()), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
