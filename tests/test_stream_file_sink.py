"""Streaming file sink + checkpoint: restartable exactly-once delivery.
The reference's commit story is FileOutputCommitter task-attempt promotion
(`lib/output/FileOutputCommitter.java:369`); Structured Streaming extends
it across RESTARTS — a second run over the same source with the same
checkpoint must add nothing (no duplicate output), which no MR chain can
express without manual bookkeeping."""

from __future__ import annotations

import shutil

from hadoop_spark.sources.tables import load_table
from hadoop_spark.streaming.windows import load_events_stream

SF_DIR = "/root/testdata/sf0.001"
OUT = "/root/repo/.tmp/stream_sink/out"
CKPT = "/root/repo/.tmp/stream_sink/ckpt"


def _run_once(spark):
    q = (
        load_events_stream(spark, SF_DIR)
        .select("event_id", "event_type", "value")
        .writeStream.format("parquet")
        .option("path", OUT)
        .option("checkpointLocation", CKPT)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()


def test_file_sink_checkpoint_is_exactly_once(spark):
    shutil.rmtree("/root/repo/.tmp/stream_sink", ignore_errors=True)
    try:
        _run_once(spark)
        n_events = load_table(spark, SF_DIR, "events").count()
        first = spark.read.parquet(OUT).count()
        assert first == n_events
        # restart with same checkpoint: source exhausted → zero new rows
        _run_once(spark)
        second = spark.read.parquet(OUT).count()
        assert second == first
    finally:
        shutil.rmtree("/root/repo/.tmp/stream_sink", ignore_errors=True)
