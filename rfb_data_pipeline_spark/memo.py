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
  the cache keys on (sf_dir, *params) only — a rebuild REPLACES the
  superseded entry — and every rebuild sweeps entries owned by any
  other (dead or replaced) session.

Semantics are unchanged: one payload per (live session, sf_dir,
params, current data fingerprint); any mismatch rebuilds.
"""

from __future__ import annotations

import os
from typing import Callable, TypeVar

from pyspark.sql import SparkSession

T = TypeVar("T")


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
    replacing the superseded entry and sweeping dead-session ones."""
    from rfb_data_pipeline_spark.catalog import data_fingerprint

    key = (os.path.abspath(sf_dir), *extra)
    fp = data_fingerprint(sf_dir, tables)
    hit = cache.get(key)
    if hit is not None and hit[0] is spark and hit[1] == fp:
        return hit[2]
    for k in [k for k, v in cache.items() if v[0] is not spark]:
        del cache[k]  # dead/replaced session: frames unusable anyway
    payload = build()
    cache[key] = (spark, fp, payload)
    return payload
