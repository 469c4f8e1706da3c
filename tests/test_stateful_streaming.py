"""applyInPandasWithState: the custom stateful operator's final
per-user state must equal the batch aggregate over the same input.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rfb_data_pipeline_spark.catalog import load_tables
from rfb_data_pipeline_spark.streaming import events_stream as es
from rfb_data_pipeline_spark.streaming.stateful import user_activity_tracker
from tests.conftest import SF_SMALL


def test_stateful_tracker_matches_batch(spark, tmp_path):
    ev = load_tables(spark, SF_SMALL, tables=("events",), register_views=False)[
        "events"
    ]
    flat = tmp_path / "in"
    flat.mkdir()
    ev.coalesce(2).write.mode("overwrite").parquet(str(flat))

    stream = es.read_events_stream(spark, str(flat))
    tracked = user_activity_tracker(stream)
    q = (
        tracked.writeStream.format("memory")
        .queryName("tracker")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # keep the LAST update per user (update mode appends every batch's
    # emission to the memory sink)
    got = (
        spark.sql("select * from tracker")
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("max_value").alias("max_value"),
        )
        .collect()
    )
    expected = {
        r.user_id: (r.n, round(r.mx, 6))
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("value").alias("mx"))
        .collect()
    }
    assert len(got) == len(expected)
    for r in got:
        n, mx = expected[r.user_id]
        assert r.n_events == n
        assert round(r.max_value, 6) == mx
