"""Shared-base session memos (_graph_shared, _doc_shingles_cached,
_pq_model_cached): hits must return the identical frames, and a
same-session rewrite of the parquet underneath must INVALIDATE the
memo (fingerprint key) instead of serving stale frames — the
cc_labels_cached contract extended to the r07 memo sweep.
"""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _mini_sf(spark, tmp_path, n_docs=6, n_events=40):
    """A tiny sf-dir with documents + events, rewritable in-place."""
    sf = tmp_path / "sf"
    sf.mkdir()
    docs = spark.createDataFrame(
        [
            (i, f"alpha beta gamma delta epsilon zeta doc {i}", "en", "web")
            for i in range(n_docs)
        ],
        "doc_id bigint, text string, lang string, source string",
    )
    docs.coalesce(1).write.parquet(str(sf / "documents.parquet"))
    ev = spark.createDataFrame(
        [
            (
                i,
                i % 5,
                "click",
                f'{{"k": {i % 4}}}',
            )
            for i in range(n_events)
        ],
        "event_id bigint, user_id bigint, event_type string, props string",
    ).withColumn("ts", F.timestamp_seconds(F.lit(1700000000) + F.col("event_id")))
    ev.coalesce(1).write.parquet(str(sf / "events.parquet"))
    return sf


def test_doc_shingles_memo_hits_and_invalidates(spark, tmp_path):
    from rfb_data_pipeline_spark.operators.dedup import _doc_shingles_cached

    sf = _mini_sf(spark, tmp_path)
    first = _doc_shingles_cached(spark, str(sf))
    again = _doc_shingles_cached(spark, str(sf))
    assert again is first  # memo hit: the very same DataFrame object
    n_before = first.count()
    assert n_before > 0

    # rewrite the documents parquet in place: HALF the docs remain
    docs = spark.read.parquet(str(sf / "documents.parquet")).where(
        F.col("doc_id") < 3
    )
    docs = docs.collect()
    shutil.rmtree(sf / "documents.parquet")
    spark.createDataFrame(
        docs,
        "doc_id bigint, text string, lang string, source string",
    ).coalesce(1).write.parquet(str(sf / "documents.parquet"))

    fresh = _doc_shingles_cached(spark, str(sf))
    assert fresh is not first  # fingerprint changed -> rebuilt
    assert fresh.select("doc_id").distinct().count() == 3


def test_graph_shared_memo_hits_and_invalidates(spark, tmp_path):
    from rfb_data_pipeline_spark.operators.graph import _graph_shared

    sf = _mini_sf(spark, tmp_path)
    gb1 = _graph_shared(spark, str(sf))
    eng1, edges1 = gb1.eng, gb1.edges
    gb2 = _graph_shared(spark, str(sf))
    eng2, edges2 = gb2.eng, gb2.edges
    assert eng2 is eng1 and edges2 is edges1
    assert gb2.nodes is gb1.nodes and gb2.tri_arcs is gb1.tri_arcs
    assert edges1.count() > 0

    # rewrite events: only item 0 remains -> no co-engagement pairs
    ev = spark.read.parquet(str(sf / "events.parquet")).collect()
    shutil.rmtree(sf / "events.parquet")
    spark.createDataFrame(
        [r for r in ev if '"k": 0' in r["props"]],
        "event_id bigint, user_id bigint, event_type string,"
        " props string, ts timestamp",
    ).coalesce(1).write.parquet(str(sf / "events.parquet"))

    gb3 = _graph_shared(spark, str(sf))
    eng3, edges3 = gb3.eng, gb3.edges
    assert eng3 is not eng1
    assert edges3.count() == 0  # single item: no pairs


def test_pq_model_memo_is_session_and_param_keyed(spark):
    from rfb_data_pipeline_spark.operators.similarity import (
        _pq_model_cached,
    )

    s1 = _pq_model_cached(spark, SF_SMALL, 4, 16)
    s2 = _pq_model_cached(spark, SF_SMALL, 4, 16)
    assert s2[2] is s1[2]  # codes frame shared on a hit
    s3 = _pq_model_cached(spark, SF_SMALL, 8, 16)
    assert s3[2] is not s1[2]  # different pq params -> distinct model


def test_memo_replaces_superseded_and_sweeps_dead_sessions(spark, tmp_path):
    """ADVICE r07: (a) a rewritten fixture must REPLACE the cache
    entry, not append a second one pinning the superseded frame for
    the process lifetime; (b) entries owned by another (dead) session
    are swept on the next rebuild; (c) the key compares the FULL
    fingerprint, not hash(fingerprint)."""
    from rfb_data_pipeline_spark.memo import session_memo

    cache: dict = {}
    sf = _mini_sf(spark, tmp_path)
    builds = {"n": 0}

    def build():
        builds["n"] += 1
        return f"payload-{builds['n']}"

    p1 = session_memo(cache, spark, str(sf), ("documents",), build)
    assert p1 == "payload-1" and len(cache) == 1
    assert session_memo(cache, spark, str(sf), ("documents",), build) is p1

    # key stores the full fingerprint tuple, never a lossy hash
    (entry,) = cache.values()
    assert isinstance(entry[1], tuple) and entry[1], "full fingerprint"

    # rewrite the fixture -> REPLACED entry (still exactly one)
    docs = spark.read.parquet(str(sf / "documents.parquet")).limit(2).collect()
    shutil.rmtree(sf / "documents.parquet")
    spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string, source string"
    ).coalesce(1).write.parquet(str(sf / "documents.parquet"))
    p2 = session_memo(cache, spark, str(sf), ("documents",), build)
    assert p2 == "payload-2" and len(cache) == 1

    # a dead/replaced session's entries are swept on the next rebuild
    cache[("zombie",)] = (object(), ("fp",), "stale-frame")
    session_memo(cache, spark, str(sf / ".."), ("documents",), build)
    assert ("zombie",) not in cache

    # same session, distinct extra params -> distinct entries coexist
    cache.clear()
    session_memo(cache, spark, str(sf), ("documents",), build, extra=(4,))
    session_memo(cache, spark, str(sf), ("documents",), build, extra=(8,))
    assert len(cache) == 2


def test_memo_live_sessions_coexist(spark, tmp_path):
    """ADVICE r08 #3: two concurrent LIVE SparkSessions sharing one
    cache must coexist — the sweep evicts only genuinely stopped
    sessions' entries, never a live sibling's (the r08 `is not spark`
    sweep thrashed: every alternating call missed and rebuilt)."""
    from rfb_data_pipeline_spark.memo import session_memo

    cache: dict = {}
    sf = _mini_sf(spark, tmp_path)
    sibling = spark.newSession()  # live, shares the local JVM context
    builds = {"n": 0}

    def build():
        builds["n"] += 1
        return f"payload-{builds['n']}"

    a1 = session_memo(cache, spark, str(sf), ("documents",), build)
    b1 = session_memo(cache, sibling, str(sf), ("documents",), build)
    assert builds["n"] == 2 and len(cache) == 2
    # alternating access HITS both ways — no eviction thrash
    assert session_memo(cache, spark, str(sf), ("documents",), build) is a1
    assert session_memo(cache, sibling, str(sf), ("documents",), build) is b1
    assert builds["n"] == 2 and len(cache) == 2


def test_r13_memos_hit_on_second_call(spark):
    """r13 optimization memos (capped shingles, minhash buckets, doc
    spans, s06 bucket ids): second call must serve the SAME frame
    object — the eager localCheckpoint builds run once per session."""
    from rfb_data_pipeline_spark.operators.dedup import (
        _capped_shingles_cached,
        _doc_spans_cached,
        _minhash_buckets_cached,
    )
    from rfb_data_pipeline_spark.operators.similarity import (
        _bucket_ids_cached,
    )

    assert _capped_shingles_cached(spark, SF_SMALL) is (
        _capped_shingles_cached(spark, SF_SMALL)
    )
    assert _minhash_buckets_cached(spark, SF_SMALL) is (
        _minhash_buckets_cached(spark, SF_SMALL)
    )
    assert _doc_spans_cached(spark, SF_SMALL) is (
        _doc_spans_cached(spark, SF_SMALL)
    )
    # wide flag keys a DISTINCT spans frame
    assert _doc_spans_cached(spark, SF_SMALL, wide=True) is not (
        _doc_spans_cached(spark, SF_SMALL)
    )
    assert _bucket_ids_cached(spark, SF_SMALL, 4, 4) is (
        _bucket_ids_cached(spark, SF_SMALL, 4, 4)
    )
    # params key distinct indexes
    assert _bucket_ids_cached(spark, SF_SMALL, 4, 8) is not (
        _bucket_ids_cached(spark, SF_SMALL, 4, 4)
    )
