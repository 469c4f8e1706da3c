"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.2 streaming: "applyInPandasWithState for custom stateful
operators").

``user_activity_tracker`` keeps per-user running totals (event count,
max value) in the state store and emits an updated row per user per
micro-batch — the building block for alerting/profile operators that
windowed aggregation can't express (state evolves arbitrarily, not
just by window membership).

State sizing (100 TB design): one fixed-width tuple per active user —
O(active keys); pair with a timeout (GroupStateTimeout) to retire idle
users when the key space is unbounded.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, max_value double"
STATE_SCHEMA = "n bigint, mx double"


def _track(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, mx = state.get if state.exists else (0, None)
    for pdf in pdfs:
        n += len(pdf)
        # skipna max: a slice whose values are all null yields NaN,
        # and max(-inf, NaN) is -inf — a sentinel that used to leak
        # into the output as max_value = -Infinity (r09 review); a
        # user with no non-null value so far reports null instead
        vmax = pdf["value"].max()
        if pd.notna(vmax):
            mx = float(vmax) if mx is None else max(mx, float(vmax))
    state.update((n, mx))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "max_value": [mx]}
    )


def user_activity_tracker(events: DataFrame) -> DataFrame:
    """Running (count, max) per user as an update stream."""
    from rfb_data_pipeline_spark.session import ship_package

    ship_package(events.sparkSession)
    return events.groupBy("user_id").applyInPandasWithState(
        _track,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------------------------------
# Streaming twin of batch e12 (ordered sequence match): per user,
# every signup converts iff the NEXT purchase after it (ts, event_id
# order) arrives within 24 h. Windowed aggregation cannot express
# "first following event of a specific type" — this is exactly the
# arbitrary-state shape applyInPandasWithState exists for.
#
# State per user: the PENDING signup timestamps (signups not yet
# followed by any purchase) plus two counters — O(pending) per key,
# and every purchase clears the pending list, so state stays bounded
# by burst length, not history. The per-event Python loop runs over
# one user's micro-batch slice (small by construction); the heavy
# lifting (grouping, state store, shuffle) stays in the JVM.
#
# Cross-batch correctness requires event-time-ordered arrival per key
# (file drops are replayed in order; the parity test feeds
# time-ordered files) — the same contract as the batch window's sort.

SEQ_OUTPUT_SCHEMA = "user_id bigint, n_signups bigint, n_converted bigint"
SEQ_STATE_SCHEMA = "pending array<bigint>, n_signups bigint, n_converted bigint"
SEQ_WINDOW_US = 24 * 3600 * 1_000_000


def _match_sequences(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        raw_pending, n_signups, n_converted = state.get
        pending = list(raw_pending or [])
    else:
        pending, n_signups, n_converted = [], 0, 0
    for pdf in pdfs:
        # null-ts events carry no position on the time axis: the batch
        # twin e12 skips them (min over when(purchase, ts) is
        # null-skipping), and NaT.astype('int64') is INT64_MIN — a
        # t = -9.2e15 µs purchase that would "convert" every pending
        # signup (r09 review)
        ordered = pdf.dropna(subset=["ts"]).sort_values(["ts", "event_id"])
        ts_us = ordered["ts"].astype("int64") // 1000  # ns -> us
        for t, etype in zip(ts_us, ordered["event_type"]):
            if etype == "signup":
                pending.append(int(t))
                n_signups += 1
            elif etype == "purchase":
                n_converted += sum(
                    1 for s in pending if t <= s + SEQ_WINDOW_US
                )
                pending = []  # first following purchase decides ALL pending
    state.update((pending, n_signups, n_converted))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_signups": [n_signups],
            "n_converted": [n_converted],
        }
    )


def sequence_matcher(events: DataFrame) -> DataFrame:
    """Streaming signup→purchase-within-24h matcher (batch twin: e12)."""
    from rfb_data_pipeline_spark.session import ship_package

    ship_package(events.sparkSession)
    return events.groupBy("user_id").applyInPandasWithState(
        _match_sequences,
        outputStructType=SEQ_OUTPUT_SCHEMA,
        stateStructType=SEQ_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4.x arbitrary-state v2): the same
# per-user running profile as ``user_activity_tracker``, on the new
# typed-state API. What v2 buys at 100 TB state scale over
# applyInPandasWithState:
#   * TYPED state handles (ValueState/ListState/MapState) — the store
#     is schema'd per state variable, not one opaque tuple, so state
#     can evolve (add a variable) without rewriting the whole store;
#   * native per-state TTL (``ttlDurationMs``) — idle keys retire in
#     the store itself, no hand-rolled timeout bookkeeping;
#   * timers (``registerTimer``) for emit-on-deadline patterns.
# The profile logic is deliberately identical to the v1 operator so
# tests can pin v1 == v2 == batch on the same input.

PROFILE_OUTPUT_SCHEMA = "user_id bigint, n_events bigint, sum_value double"


def user_profile_tws(events: DataFrame, ttl_ms: int | None = None) -> DataFrame:
    """Running (count, sum) per user via transformWithStateInPandas.

    REQUIRES the RocksDB state store provider (the v2 operator's
    store contract):

        spark.conf.set("spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider")

    set BEFORE the query starts (provider is bound per query from
    session conf; it cannot be a writer option). RocksDB is also the
    right provider at 100 TB state scale — spillable, incremental
    checkpointing, not heap-bound like the HDFS-backed default.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class ProfileProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._profile = handle.getValueState(
                "profile", "n bigint, total double", ttlDurationMs=ttl_ms
            )

        def handleInputRows(self, key, rows, timerValues):
            n, total = (
                self._profile.get() if self._profile.exists() else (0, 0.0)
            )
            for pdf in rows:
                n += len(pdf)
                if len(pdf):
                    total += float(pdf["value"].sum())
            self._profile.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "sum_value": [total],
                }
            )

        def close(self) -> None:
            pass

    from rfb_data_pipeline_spark.session import ship_package

    ship_package(events.sparkSession)
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=ProfileProcessor(),
        outputStructType=PROFILE_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
