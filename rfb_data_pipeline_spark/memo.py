"""Session-scoped memoization of shared materialized frames.

Seven operator families share expensive materialized bases (graph
edges, document shingles, simhash fingerprints, exploded tokens, CC
labels, classifier scores, PQ models). Each used the same inline
idiom; this module centralizes it and fixes the r07 ADVICE defects:

- the cache key compared ``hash(data_fingerprint(...))`` — a (seeded,
  64-bit) hash collision would silently serve a stale frame. The FULL
  fingerprint tuple is compared now.
- entries were never evicted: a rewritten fixture appended a new key
  (pinning the superseded localCheckpointed frame for the process
  lifetime) and a stopped SparkSession's entries lived forever. Now
  the cache keys on (session identity, sf_dir, params) — a rebuild
  REPLACES the superseded entry — and every rebuild sweeps entries
  owned by sessions that are actually STOPPED.

ADVICE r08 #3: the r08 sweep deleted every entry whose session ``is
not spark``, which also evicted entries owned by OTHER LIVE sessions
— two concurrent SparkSessions sharing a cache would thrash (every
call misses and rebuilds). The key now carries the session identity
so live sessions coexist, and the sweep tests each owner for real
stopped state (``sparkContext._jsc is None`` / ``isStopped()``)
instead of mere non-identity.

Semantics are otherwise unchanged: one payload per (live session,
sf_dir, params, current data fingerprint); any mismatch rebuilds.
"""

from __future__ import annotations

import os
from typing import Callable, TypeVar

from pyspark.sql import SparkSession

T = TypeVar("T")


def _is_stopped(session) -> bool:
    """True iff the session's underlying SparkContext is stopped (or
    the object is not a usable session at all). PySpark sets
    ``SparkContext._jsc = None`` on stop; a live JVM context also
    answers ``sc().isStopped()``."""
    try:
        jsc = getattr(session.sparkContext, "_jsc", None)
        return jsc is None or jsc.sc().isStopped()
    except Exception:
        return True


def session_memo(
    cache: dict,
    spark: SparkSession,
    sf_dir: str,
    tables: tuple[str, ...],
    build: Callable[[], T],
    extra: tuple = (),
) -> T:
    """Return the memoized payload for (session, sf_dir, extra) if its
    data fingerprint is current; otherwise rebuild via ``build()``,
    replacing the superseded entry and sweeping stopped-session ones.

    The key includes ``id(spark)``; the value keeps a strong reference
    to the session object, so a key can never alias a recycled id
    while its entry is alive.
    """
    from rfb_data_pipeline_spark.catalog import data_fingerprint

    key = (id(spark), os.path.abspath(sf_dir), *extra)
    fp = data_fingerprint(sf_dir, tables)
    hit = cache.get(key)
    if hit is not None and hit[0] is spark and hit[1] == fp:
        return hit[2]
    for k in [k for k, v in cache.items() if _is_stopped(v[0])]:
        del cache[k]  # stopped session: frames unusable anyway
    payload = build()
    cache[key] = (spark, fp, payload)
    return payload
