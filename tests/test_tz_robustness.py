"""Timezone robustness: the grading driver runs ``queries()`` in its
OWN SparkSession (no repo confs, so no UTC session timezone) on a host
whose OS timezone we don't control. PySpark collects LTZ timestamps
through the OS timezone — not the session conf — so every timestamp-
producing query must emit TIMESTAMP_NTZ/DATE or it drifts against the
DuckDB oracle when the host isn't UTC.

This test replays that exact environment: a subprocess with
``TZ=America/Sao_Paulo`` (UTC-3, and a DST history that catches
naive-offset bugs) and a BARE SparkSession, running the oracle gate
for every query whose output schema contains a timestamp or date.
"""

from __future__ import annotations

import os
import subprocess
import sys

from tests.conftest import REPO_ROOT, SF_SMALL

# Every query emitting timestamp/date columns (window starts, session
# bounds, as-of matches, cohort weeks, spike hours, date scalars).
_TIME_QUERIES = [
    "e01_tumbling_hourly",
    "e02_sliding_window",
    "e03_sessionize",
    "e06_event_gaps",
    "e09_asof_join",
    "e10_retention_cohorts",
    "e11_spike_detection",
    "q14_date_functions",
    "q30_moving_range_sum",
    "q32_window_values",
]


def test_time_queries_under_nonutc_tz_and_bare_session():
    env = dict(os.environ)
    env["TZ"] = "America/Sao_Paulo"
    env["ORACLE_BARE_SESSION"] = "1"
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO_ROOT, "tools", "check_oracle.py"),
            SF_SMALL,
            *_TIME_QUERIES,
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO_ROOT,
    )
    tail = "\n".join(proc.stdout.splitlines()[-25:])
    assert proc.returncode == 0, f"oracle gate failed under TZ:\n{tail}"
    assert f"{len(_TIME_QUERIES)} passed, 0 failed" in proc.stdout, tail
