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
    n, mx = state.get if state.exists else (0, float("-inf"))
    for pdf in pdfs:
        n += len(pdf)
        if len(pdf):
            mx = max(mx, float(pdf["value"].max()))
    state.update((n, mx))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "max_value": [mx]}
    )


def user_activity_tracker(events: DataFrame) -> DataFrame:
    """Running (count, max) per user as an update stream."""
    return events.groupBy("user_id").applyInPandasWithState(
        _track,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
