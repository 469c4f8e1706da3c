"""Round-6 operators (t19 BM25, e23 CUSUM): non-vacuousness on stock
data plus independent pure-Python model checks — the oracle gate
proves Spark==DuckDB; these prove both engines compute the THING
(discriminating retrieval scores; the textbook CUSUM recursion)."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_t19_scores_discriminate_and_reward_rare_terms(spark):
    from rfb_data_pipeline_spark.operators.text import (
        BM25_QUERY,
        t19_bm25_search,
        tokens_col,
    )

    out = t19_bm25_search(spark, SF_SMALL).collect()
    assert len(out) > 10
    scores = {r["doc_id"]: r["bm25"] for r in out}
    assert len(set(scores.values())) > 10, "scores do not discriminate"
    # the rare term ('dup') carries the IDF mass: docs matching it must
    # outscore the corpus median
    docs = spark.read.parquet(SF_SMALL + "/documents.parquet")
    rare = {
        r["doc_id"]
        for r in docs.select(
            "doc_id", F.array_contains(tokens_col(), BM25_QUERY[0]).alias("m")
        )
        .where("m")
        .collect()
    }
    assert rare, "fixture lost the rare query term"
    rare_scores = sorted(v for k, v in scores.items() if k in rare)
    other = sorted(v for k, v in scores.items() if k not in rare)
    assert rare_scores[0] > other[len(other) // 2], (
        rare_scores[0],
        other[len(other) // 2],
    )


def _py_cusum(counts: list[int], h_means: int):
    """Independent model: the textbook one-sided recursion
    s_i = max(0, s_{i-1} + (x_i - mean)), detection at s > h*mean —
    run in exact fractions via integer N-units like the operator."""
    n, t = len(counts), sum(counts)
    s_units, mx, detected_at = 0, 0, None
    for i, x in enumerate(counts):
        s_units = max(0, s_units + (x * n - t))
        mx = max(mx, s_units)
        if detected_at is None and s_units > h_means * t:
            detected_at = i
    return mx, detected_at


def _events_from_hourly(spark, tmp_path, counts_by_type):
    base = dt.datetime(2024, 9, 1)
    rows, eid = [], 0
    for etype, counts in counts_by_type.items():
        for hour, c in enumerate(counts):
            for _ in range(c):
                eid += 1
                rows.append(
                    (
                        eid,
                        base + dt.timedelta(hours=hour, seconds=eid % 3600),
                        eid % 7,
                        etype,
                        1.0,
                        None,
                    )
                )
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_e23_matches_python_model_on_known_changepoint(spark, tmp_path):
    from rfb_data_pipeline_spark.operators.events import (
        _CUSUM_H_MEANS,
        e23_cusum_changepoint,
    )

    # 'shifted': 48 quiet hours at 1/h then 24 loud hours at 10/h — a
    # textbook level shift; 'steady': perfectly uniform load, where
    # the statistic must stay at 0 and the flag must stay DOWN (the
    # detector can say no).
    counts = {"shifted": [1] * 48 + [10] * 24, "steady": [3] * 72}
    sf = _events_from_hourly(spark, tmp_path, counts)
    got = {r["event_type"]: r for r in e23_cusum_changepoint(spark, sf).collect()}
    base = dt.datetime(2024, 9, 1)
    for etype, series in counts.items():
        mx, det = _py_cusum(series, _CUSUM_H_MEANS)
        row = got[etype]
        assert row["max_cusum_units"] == mx, etype
        if det is None:
            assert row["shift_detected"] == 0 and row["detected_at"] is None
        else:
            assert row["shift_detected"] == 1
            assert row["detected_at"] == base + dt.timedelta(hours=det)
    assert got["shifted"]["shift_detected"] == 1  # the shift IS found
    assert got["steady"]["max_cusum_units"] == 0  # uniform load: flat


def test_e23_detects_on_stock_corpus(spark):
    """Stock events carry a real sustained-above-mean regime; the
    driver row would be vacuous if no type ever crossed."""
    from rfb_data_pipeline_spark.operators.events import (
        e23_cusum_changepoint,
    )

    rows = e23_cusum_changepoint(spark, SF_SMALL).collect()
    assert rows and all(r["shift_detected"] == 1 for r in rows)
    assert all(r["detected_at"] is not None for r in rows)
