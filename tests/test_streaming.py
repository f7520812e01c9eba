"""Streaming: the window helpers declare identical plans on batch and
stream inputs; a rate-source smoke test executes one micro-batch."""

import time

import pytest
from pyspark.sql import functions as F

from pythonql_spark.streaming import (
    session_agg,
    sliding_agg,
    tumbling_agg,
    with_watermark,
)


def test_batch_stream_same_api(spark, tables):
    ev = tables["events"]
    out = tumbling_agg(ev, "1 hour", keys=["event_type"])
    assert {"window_start", "event_type", "n_events"} <= set(out.columns)
    out2 = sliding_agg(ev, "1 hour", "30 minutes")
    # every event lands in exactly 2 sliding windows
    total = out2.agg(F.sum("n_events")).first()[0]
    assert total == 2 * ev.count()
    out3 = session_agg(ev, "30 minutes", keys=["user_id"])
    assert out3.count() > 0


def test_stream_smoke(spark):
    stream = (spark.readStream.format("rate")
              .option("rowsPerSecond", 100).load()
              .withColumnRenamed("timestamp", "ts"))
    agg = tumbling_agg(with_watermark(stream, "ts", "5 seconds"),
                       "5 seconds", ts_col="ts")
    assert agg.isStreaming
    q = (agg.writeStream.format("memory").queryName("t_smoke")
         .outputMode("append").trigger(processingTime="1 second").start())
    try:
        deadline = time.time() + 30
        while time.time() < deadline and not q.recentProgress:
            time.sleep(1)
        assert q.isActive
    finally:
        q.stop()
    # schema contract held on a live stream
    assert "window_start" in spark.table("t_smoke").columns
