"""Physical-plan inspection helpers.

The 100 TB contract is about plan shape, not just results: filters
must reach the scan, projections must prune, small dims must
broadcast, top-k must not global-sort, and Python must not appear in
the hot path. These helpers turn those properties into assertions so
they are regression-tested (tests/test_plan_shape.py), not hoped for.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_string(df: DataFrame, mode: str = "formatted") -> str:
    jdf = df._jdf
    jvm = df.sparkSession._jvm
    return jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's file scans."""
    plan = explain_string(df)
    return [m for m in re.findall(r"PushedFilters: \[([^\]]*)\]", plan) if m]


def read_schemas(df: DataFrame) -> list[str]:
    plan = explain_string(df)
    return re.findall(r"ReadSchema: (\S+)", plan)


def operator_counts(df: DataFrame) -> dict[str, int]:
    """Operator-name histogram over the simple plan. The key is the
    operator's FIRST word only, and nested-tree prefixes (':  +-')
    parse (r09 review: the old pattern dropped ':'-prefixed lines and
    folded operand words into the key)."""
    plan = explain_string(df, mode="simple")
    ops = re.findall(
        r"^[\s:+\-]*\*?\(?\d*\)?\s*([A-Za-z]\w*)", plan, re.M
    )
    out: dict[str, int] = {}
    for o in ops:
        out[o] = out.get(o, 0) + 1
    return out


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_string(df, mode="simple")


def uses_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in explain_string(df, mode="simple")


def has_python_eval(df: DataFrame) -> bool:
    """True if any Python row-at-a-time eval appears (BatchEvalPython);
    Arrow-batched pandas ops (ArrowEvalPython/MapInPandas) excluded."""
    plan = explain_string(df, mode="simple")
    return "BatchEvalPython" in plan


def n_exchanges(df: DataFrame) -> int:
    """Shuffle exchange count. Broadcast exchanges are excluded, and
    so are ReusedExchange nodes — a reused exchange replays an
    existing map output, it is not a new shuffle (r09 review: the
    'Exchange' suffix of 'ReusedExchange' used to count, so a reused
    BROADCAST side inflated the shuffle budget)."""
    plan = explain_string(df, mode="simple")
    return len(re.findall(r"(?<!Broadcast)(?<!Reused)Exchange", plan))
