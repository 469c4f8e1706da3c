"""SparkSession factory with scale-oriented defaults.

The reference pipeline is single-threaded and chunk-oriented
(reference src/main.py:204 — pandas chunksize=50000); here the unit of
parallelism is the Spark partition and the knobs below are the ones
that matter at cluster scale: AQE (runtime coalescing + skew-join
splitting), broadcast threshold for the small dimension tables, and
Arrow for any pandas interchange.
"""

from __future__ import annotations

import os
import threading

from pyspark.sql import SparkSession

_SHIP_LOCK = threading.Lock()

# Tuned for the local[CPUS] harness; on a real cluster these come from
# spark-submit conf. Shuffle partitions are deliberately low locally —
# AQE coalesces further — while at 100 TB the same code runs with
# shuffle.partitions sized to ~2-3x total cores (AQE still right-sizes).
_DEFAULTS = {
    # Adaptive execution: post-shuffle coalescing, skew-join splitting,
    # runtime sort-merge->broadcast demotion. Essential at scale where
    # static planning can't know per-key cardinalities (e.g. skewed
    # cnpj_basico keys — SURVEY.md §4).
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # AQE coalesces by SHUFFLE BYTES, but several operators (minhash,
    # simhash, shingle joins) do heavy per-row CPU (md5 chains) after a
    # small-byte shuffle — the default 1 MB floor collapses them to 2-3
    # tasks and serializes the math. A smaller floor keeps those stages
    # at full parallelism; large shuffles are unaffected (they coalesce
    # by the advisory target size long before this floor matters).
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "64k",
    # Dimension tables (region/nation/supplier, RFB code tables) are
    # tiny; make sure they broadcast rather than shuffle.
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    # Arrow for pandas_udf / mapInPandas / toPandas round-trips.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Deterministic timestamps: align with the DuckDB oracle (UTC).
    "spark.sql.session.timeZone": "UTC",
    # Partition pruning across joins (month-partitioned RFB layout).
    "spark.sql.optimizer.dynamicPartitionPruning.enabled": "true",
    # Projection-independent corrupt-row detection for the permissive
    # RFB CSV scans (read_rfb_csv re-sets this at runtime for bare
    # sessions; having it in the builder avoids the mid-session flip).
    "spark.sql.csv.parser.columnPruning.enabled": "false",
    "spark.ui.enabled": "false",
    # local[N] runs everything in one JVM whose default heap (1g) is
    # sized for a thin driver, not for 32 executor threads; candidate-
    # generation joins (d02/d10 shingle indexes) need real executor
    # heap. On a cluster this is spark.executor.memory instead.
    "spark.driver.memory": "16g",
    # Managed-table location for bucketed tables (kept out of the repo).
    "spark.sql.warehouse.dir": "/tmp/rfb-spark-warehouse",
    # Reliable checkpoints (stage_boundary mode="storage") are
    # reference-tracked: release a checkpoint's files when its frame
    # is GC'd, so iterative callers (cc_star rounds) don't accumulate
    # dead checkpoint dirs for the life of the app. Context-creation
    # conf — it must be here, not set at runtime.
    "spark.cleaner.referenceTracking.cleanCheckpoints": "true",
}


def get_spark(
    app_name: str = "rfb-data-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or local[*]).
    ``shuffle_partitions`` defaults to the local core count — at real
    cluster scale pass a value sized to the executor fleet instead.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else os.cpu_count() or 8

    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULTS)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def ship_package(spark: SparkSession) -> None:
    """Make ``rfb_data_pipeline_spark`` importable on Python WORKERS.

    mapInPandas/pandas_udf closures that reference module-level
    helpers are pickled BY REFERENCE — the worker process must import
    the module itself. That works by accident when the caller's cwd is
    the repo root (local mode inherits it), and fails everywhere else:
    a driver started from another directory, or any real cluster,
    where executors never share the driver's filesystem layout. Found
    by the bare-session driver smoke run from /tmp.

    Fix: zip the package once per process and ``addPyFile`` it —
    Spark ships the zip to every executor and puts it on the worker
    PYTHONPATH. Idempotent per SparkContext.
    """
    import atexit
    import shutil
    import tempfile

    sc = spark.sparkContext
    # Lock around the whole check-then-build-then-register sequence:
    # two threads racing a fresh context would each mkdtemp and
    # addPyFile two different paths with the same basename 'pkg.zip',
    # which Spark rejects as a same-name/different-path registration.
    with _SHIP_LOCK:
        if getattr(sc, "_rfb_pkg_shipped", False):
            return
        pkg_dir = os.path.dirname(os.path.abspath(__file__))
        root = os.path.dirname(pkg_dir)
        # fresh private dir per SparkContext: a name keyed on pid could
        # collide with a STALE zip from an older checkout after pid
        # reuse. Registered for atexit removal so context restarts in a
        # long-lived process don't leak temp dirs.
        tmp_dir = tempfile.mkdtemp(prefix="rfb_pkg_ship_")
        atexit.register(shutil.rmtree, tmp_dir, ignore_errors=True)
        zip_path = shutil.make_archive(
            os.path.join(tmp_dir, "pkg"),
            "zip",
            root_dir=root,
            base_dir="rfb_data_pipeline_spark",
        )
        sc.addPyFile(zip_path)
        sc._rfb_pkg_shipped = True
