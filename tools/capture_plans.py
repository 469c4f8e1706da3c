"""Write .explain('formatted') for the given queries to a directory.

Usage: python tools/capture_plans.py OUTDIR SUFFIX query [query ...]
Creates OUTDIR/<query>_<SUFFIX>.txt. Session-memoized bases are built
first so the captured plan is the steady-state one (the shape every
timed rep executes), and an Exchange/operator census line is appended
for quick diffing.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from rfb_data_pipeline_spark.session import get_spark

    # bench BEFORE __spark_entry__: the entry module prepends
    # /root/repo to sys.path, which would shadow a scratch worktree's
    # own bench.py and mix two source trees in one process.
    import bench
    import __spark_entry__ as entry_mod

    spark = get_spark("rfb-plan-capture")
    qs = entry_mod.queries()
    for build in bench.base_builders(spark, sf_dir).values():
        build()

    from pyspark.sql.functions import expr  # noqa: F401  (import check)

    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        census = {
            "Exchange": len(re.findall(r"\bExchange\b", plan)),
            "BroadcastHashJoin": plan.count("BroadcastHashJoin"),
            "SortMergeJoin": plan.count("SortMergeJoin"),
            "ShuffledHashJoin": plan.count("ShuffledHashJoin"),
            "Window": len(re.findall(r"\bWindow\b", plan)),
            "BatchEvalPython": plan.count("BatchEvalPython"),
            "ArrowEvalPython": plan.count("ArrowEvalPython"),
            "Scan parquet": plan.count("Scan parquet"),
        }
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
            fh.write(
                "\n== operator census ==\n"
                + "\n".join(f"{k}: {v}" for k, v in census.items())
                + "\n"
            )
        print(name, census)


if __name__ == "__main__":
    main()
