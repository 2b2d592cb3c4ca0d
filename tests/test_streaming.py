"""Structured Streaming equivalence: the same windowed transform run over
a file-source stream (availableNow micro-batches) must produce the batch
result. Also exercises watermarking on the streaming path."""

from __future__ import annotations

import os

import pytest

from formula_1_spark.sources.tables import load_table
from formula_1_spark.streaming.windows import (
    run_stream_to_memory,
    session_window_agg,
    stream_from_parquet_dir,
    tumbling_window_agg,
)


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory, spark, sf_dir):
    """Re-land events as micros-timestamped parquet (the NANOS original
    can't be streamed without the session conf) split into several files
    to get multiple micro-batch inputs."""
    out = str(tmp_path_factory.mktemp("events_stream"))
    load_table(spark, sf_dir, "events").repartition(4).write.mode("overwrite").parquet(out)
    return out


def _rows_set(df):
    return {tuple(r) for r in df.collect()}


def test_tumbling_stream_equals_batch(spark, events_dir):
    batch_events = spark.read.parquet(events_dir)
    expected = _rows_set(tumbling_window_agg(batch_events))

    stream = stream_from_parquet_dir(spark, events_dir, batch_events.schema)
    assert stream.isStreaming
    result = tumbling_window_agg(stream, watermark="2 hours")
    q = run_stream_to_memory(result, "tumbling_mem", mode="complete")
    q.awaitTermination(120)
    got = _rows_set(spark.sql("SELECT * FROM tumbling_mem"))
    assert got == expected


def test_session_stream_equals_batch(spark, events_dir):
    batch_events = spark.read.parquet(events_dir)
    expected = _rows_set(session_window_agg(batch_events))

    stream = stream_from_parquet_dir(spark, events_dir, batch_events.schema)
    result = session_window_agg(stream, watermark="2 hours")
    q = run_stream_to_memory(result, "session_mem", mode="complete")
    q.awaitTermination(120)
    got = _rows_set(spark.sql("SELECT * FROM session_mem"))
    assert got == expected
