"""Table catalog over the driver's parquet corpus.

Loads the TPC-H-ish star schema + documents/embeddings/events tables
(TESTDATA.md) as DataFrames and registers temp views so both the
DataFrame and ``spark.sql`` surfaces work. Parquet scans keep column
pruning and predicate pushdown (verify with .explain → ReadSchema /
PushedFilters).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Broadcast behavior for the small dimensions (region/nation, the RFB
# code tables) is enforced by spark.sql.autoBroadcastJoinThreshold in
# session.py plus explicit F.broadcast calls at the join sites — no
# table list to drift out of date here.


def data_fingerprint(sf_dir: str, tables: tuple[str, ...]) -> tuple:
    """(path, mtime_ns, size) for every parquet file of ``tables``
    under ``sf_dir`` — a cheap cache-key component so session-scoped
    memos (cc_labels_cached, t15_scores_cached) can never serve stale
    frames after the parquet underneath is rewritten in-session
    (fixture rebuilds, incremental refreshes)."""
    parts: list[tuple[str, int, int]] = []
    for t in tables:
        p = os.path.join(os.path.abspath(sf_dir), f"{t}.parquet")
        if os.path.isfile(p):
            st = os.stat(p)
            parts.append((p, st.st_mtime_ns, st.st_size))
        elif os.path.isdir(p):
            for root, _dirs, files in os.walk(p):
                for f in sorted(files):
                    fp = os.path.join(root, f)
                    st = os.stat(fp)
                    parts.append((fp, st.st_mtime_ns, st.st_size))
    return tuple(sorted(parts))


def load_tables(
    spark: SparkSession,
    sf_dir: str,
    tables: tuple[str, ...] = TABLES,
    register_views: bool = True,
) -> dict[str, DataFrame]:
    """Load each parquet table under ``sf_dir`` and register temp views."""
    # The events table carries TIMESTAMP(NANOS) which the vectorized
    # parquet reader rejects; read nanos as long and rebuild the
    # microsecond timestamp (lossless for our data: truncation only).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # timestamp_micros() yields LTZ, whose collected value depends on
    # the client OS timezone; cast to NTZ under a UTC session so the
    # wall-clock value equals the raw data (and the oracle's naive
    # timestamps) on any machine.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    out: dict[str, DataFrame] = {}
    for name in tables:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = spark.read.parquet(path)
        if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn(
                # pmod-floor, not `div`: integral div truncates toward
                # zero, so a pre-epoch (negative) nanosecond value
                # would round to the WRONG microsecond (r09 review;
                # the fixtures are post-1970, so latent)
                "ts",
                F.timestamp_micros(
                    F.expr("(ts - pmod(ts, 1000)) div 1000")
                ).cast("timestamp_ntz"),
            )
        out[name] = df
        if register_views:
            df.createOrReplaceTempView(name)
    return out
