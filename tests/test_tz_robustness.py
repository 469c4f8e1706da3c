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

def _time_queries(spark) -> list[str]:
    """Every query whose OUTPUT schema carries a timestamp/date —
    discovered from the schemas (analysis only, nothing executed) so
    new operators are gated automatically instead of by a hand list."""
    import __spark_entry__ as entry_mod

    names = []
    for name, fn in sorted(entry_mod.queries().items()):
        fields = fn(spark, SF_SMALL).schema.fields
        if any(
            t in f.dataType.simpleString()
            for f in fields
            for t in ("timestamp", "date")
        ):
            names.append(name)
    return names


def test_time_queries_under_nonutc_tz_and_bare_session(spark):
    time_queries = _time_queries(spark)
    assert len(time_queries) >= 10, time_queries  # e01.., q14, q32...
    env = dict(os.environ)
    env["TZ"] = "America/Sao_Paulo"
    env["ORACLE_BARE_SESSION"] = "1"
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO_ROOT, "tools", "check_oracle.py"),
            SF_SMALL,
            *time_queries,
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO_ROOT,
    )
    tail = "\n".join(proc.stdout.splitlines()[-25:])
    assert proc.returncode == 0, f"oracle gate failed under TZ:\n{tail}"
    assert f"{len(time_queries)} passed, 0 failed" in proc.stdout, tail
