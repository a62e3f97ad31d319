"""Structured Streaming tests: the windowed aggregation runs as a real
stream (memory sink) and agrees with its batch twin."""

import time

from pyspark.sql import functions as F

from osmcoastline_spark.streaming.events import (
    segment_stream_diff,
    windowed_counts_batch,
    windowed_counts_stream,
)


def _events_df(spark):
    rows = [
        (1, "2024-01-01 00:10:00", "click", 1.0),
        (2, "2024-01-01 00:50:00", "click", 2.0),
        (3, "2024-01-01 01:10:00", "view", 3.0),
        (4, "2024-01-01 01:20:00", "click", 4.0),
    ]
    return spark.createDataFrame(rows, "event_id long, ts string, event_type string, value double").withColumn(
        "ts", F.to_timestamp("ts")
    )


def test_stream_matches_batch(spark):
    batch = _events_df(spark)
    expected = {
        (r.window_start, r.event_type): (r.n, r.total_value)
        for r in windowed_counts_batch(batch, minutes=60).withColumn(
            "window_start", F.to_timestamp("window_start")
        ).collect()
    }

    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", "4").load()
        .withColumn("event_id", F.col("value").cast("long"))
        .filter(F.col("event_id") < 4)
        .withColumn("ts", F.expr(
            "CASE value % 4 WHEN 0 THEN timestamp'2024-01-01 00:10:00' "
            "WHEN 1 THEN timestamp'2024-01-01 00:50:00' "
            "WHEN 2 THEN timestamp'2024-01-01 01:10:00' "
            "ELSE timestamp'2024-01-01 01:20:00' END"))
        .withColumn("event_type", F.expr("CASE value % 4 WHEN 2 THEN 'view' ELSE 'click' END"))
        .withColumn("value", F.col("value").cast("double") + 1.0)
    )
    agg = windowed_counts_stream(stream, minutes=60, watermark="10 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_agg")
        .outputMode("complete")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 60
        got = {}
        while time.time() < deadline:
            rows = spark.sql("SELECT * FROM win_agg").collect()
            got = {(r.window_start, r.event_type): (r.n, r.total_value) for r in rows}
            if set(got) == set(expected) and all(got[k][0] == expected[k][0] for k in got):
                break
            time.sleep(1)
        assert set(got) == set(expected), (got, expected)
        for k in expected:
            assert got[k][0] == expected[k][0]
            assert abs(got[k][1] - expected[k][1]) < 1e-9
    finally:
        q.stop()


def test_segment_stream_diff_plan(spark):
    baseline = spark.createDataFrame(
        [(0.0, 0.0, 1.0, 1.0)], "x1 double, y1 double, x2 double, y2 double"
    )
    incoming = spark.createDataFrame(
        [(0.0, 0.0, 1.0, 1.0), (2.0, 2.0, 3.0, 3.0)],
        "x1 double, y1 double, x2 double, y2 double",
    )
    # batch semantics of the stream-static anti-join
    out = segment_stream_diff(incoming, baseline).collect()
    assert len(out) == 1 and out[0].x1 == 2.0
