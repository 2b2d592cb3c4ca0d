"""Streaming dedup: duplicated input stream collapses to distinct keys."""

from __future__ import annotations

from formula_1_spark.sources.tables import load_table
from formula_1_spark.streaming.windows import stream_dedup, stream_from_parquet_dir


def test_stream_dedup_within_watermark(spark, sf_dir, tmp_path):
    src = str(tmp_path / "dup_src")
    events = load_table(spark, sf_dir, "events").limit(200)
    # Write the same rows twice -> every event_id duplicated.
    doubled = events.union(events)
    doubled.repartition(2).write.mode("overwrite").parquet(src)

    stream = stream_from_parquet_dir(spark, src, events.schema)
    deduped = stream_dedup(stream, ["event_id"], watermark="24 hours")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT event_id FROM dedup_mem").collect()
    ids = [r["event_id"] for r in got]
    assert len(ids) == len(set(ids)), "duplicates survived"
    assert set(ids) == {r["event_id"] for r in events.collect()}
