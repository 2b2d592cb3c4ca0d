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


def test_watermark_late_counts_match_streaming_metric(spark, sf_dir, tmp_path):
    """The batch watermark replay (watermark_late_counts) must agree with
    the REAL engine: run the same jittered arrival order through a
    file-source stream (one file per trigger bucket, maxFilesPerTrigger=1)
    with withWatermark + an event-time aggregation, and compare the
    replay's n_late against Structured Streaming's own
    numRowsDroppedByWatermark metric summed over triggers."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from formula_1_spark.queries.windows_events import (
        _WM_TRIGGER_S,
        watermark_late_counts,
        wm_arrival_us,
    )
    from formula_1_spark.sources.tables import load_table

    delay_s = 60
    # First 220 events: ~210 single-file triggers runs in ~2 min solo and
    # the jittered order contains a genuinely-late row within the prefix
    # (event 215 arrives > 60 s behind the lag-2 watermark).
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") < 220)
        .select("event_id", "user_id", "ts")
    )
    t_us = F.unix_micros("ts")
    rows = (
        ev.select(
            "event_id",
            t_us.alias("t_us"),
            (
                wm_arrival_us(t_us, F.col("event_id"))
                / F.lit(_WM_TRIGGER_S * 1_000_000)
            )
            .cast("bigint")
            .alias("trigger_id"),
        )
        .orderBy("trigger_id", "event_id")
        .collect()
    )

    # One parquet file per trigger bucket, strictly increasing mtimes and
    # lexicographic names, so the file source replays the arrival order.
    src = tmp_path / "wm_stream"
    src.mkdir()
    triggers = sorted({r["trigger_id"] for r in rows})
    for i, trig in enumerate(triggers):
        chunk = [r for r in rows if r["trigger_id"] == trig]
        tbl = pa.table(
            {
                "event_id": pa.array([r["event_id"] for r in chunk], pa.int64()),
                "t_us": pa.array([r["t_us"] for r in chunk], pa.int64()),
            }
        )
        path = src / f"t{i:06d}.parquet"
        pq.write_table(tbl, str(path))
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))

    stream = (
        spark.readStream.schema("event_id long, t_us long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .select("event_id", F.timestamp_micros("t_us").alias("ts"))
    )
    # Aggregating ON the event-time column drops a row iff ts < watermark
    # — the strict comparison the replay models.
    agg = stream.withWatermark("ts", f"{delay_s} seconds").groupBy("ts").count()
    # recentProgress defaults to the last 100 triggers; one file per
    # trigger bucket can exceed that, silently dropping early metrics.
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "5000")
    q = (
        agg.writeStream.format("memory")
        .queryName("wm_equiv")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    import time as _time

    deadline = _time.time() + 900  # suite-load headroom: ~1 s/trigger solo
    while q.isActive and _time.time() < deadline:
        _time.sleep(2)
    assert not q.isActive, "stream did not drain all triggers in time"
    dropped = sum(
        so["numRowsDroppedByWatermark"]
        for p in q.recentProgress
        for so in p["stateOperators"]
    )

    replay = {
        r["delay_s"]: r["n_late"]
        for r in watermark_late_counts(ev, _WM_TRIGGER_S, (delay_s,)).collect()
    }
    assert dropped == replay[delay_s] > 0, (dropped, replay)


def test_dynamic_session_stream_equals_batch(spark, events_dir):
    """The dynamic-gap (per-row expression) session window must merge
    identically on the streaming path — the session state store handles
    variable-width interval merging."""
    from formula_1_spark.streaming.windows import dynamic_session_window_agg

    batch_events = spark.read.parquet(events_dir)
    expected = _rows_set(dynamic_session_window_agg(batch_events))

    stream = stream_from_parquet_dir(spark, events_dir, batch_events.schema)
    result = dynamic_session_window_agg(stream, watermark="2 hours")
    q = run_stream_to_memory(result, "dyn_session_mem", mode="complete")
    q.awaitTermination(120)
    got = _rows_set(spark.sql("SELECT * FROM dyn_session_mem"))
    assert got == expected
