"""Stream-stream interval join: the watermarked streaming run must equal
the batch run of the same transform (availableNow micro-batches)."""

from __future__ import annotations

import pytest

from formula_1_spark.sources.tables import load_table
from formula_1_spark.streaming.joins import click_purchase_attribution
from formula_1_spark.streaming.windows import (
    run_stream_to_memory,
    stream_from_parquet_dir,
)


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory, spark, sf_dir):
    out = str(tmp_path_factory.mktemp("events_join_stream"))
    load_table(spark, sf_dir, "events").repartition(4).write.mode(
        "overwrite"
    ).parquet(out)
    return out


def test_stream_join_equals_batch(spark, events_dir):
    batch_events = spark.read.parquet(events_dir)
    expected = {tuple(r) for r in click_purchase_attribution(batch_events).collect()}
    assert expected  # the join must actually produce pairs

    stream = stream_from_parquet_dir(spark, events_dir, batch_events.schema)
    result = click_purchase_attribution(stream, watermark="2 hours")
    assert result.isStreaming
    q = run_stream_to_memory(result, "join_mem", mode="append")
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.sql("SELECT * FROM join_mem").collect()}
    assert got == expected


def test_stream_static_enrich_equals_batch(spark, sf_dir, events_dir):
    from formula_1_spark.streaming.joins import segment_event_rollup

    customer = load_table(spark, sf_dir, "customer")
    batch_events = spark.read.parquet(events_dir)
    expected = {tuple(r) for r in segment_event_rollup(batch_events, customer).collect()}
    assert expected

    stream = stream_from_parquet_dir(spark, events_dir, batch_events.schema)
    result = segment_event_rollup(stream, customer)
    assert result.isStreaming
    q = run_stream_to_memory(result, "enrich_mem", mode="complete")
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.sql("SELECT * FROM enrich_mem").collect()}
    assert got == expected


def test_stream_static_dim_is_broadcast(spark, sf_dir):
    from formula_1_spark.streaming.joins import enrich_with_customer

    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")
    plan = (
        enrich_with_customer(events, customer)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan



def test_stream_outer_join_equals_batch(spark, sf_dir, tmp_path):
    """OUTER stream-stream join: matched pairs emit immediately;
    unmatched purchases emit with NULL click columns only after the
    GLOBAL watermark (min over BOTH sides' event-time columns) passes
    their expiry — so the flush sentinels must advance both sides.
    Far-future sentinel click+purchase pairs (nonexistent user -1)
    appended between checkpointed availableNow runs do that; the final
    output must equal the batch run exactly."""
    from pyspark.sql import functions as F

    from formula_1_spark.streaming.joins import purchase_attribution_outer

    # Private events copy: this test appends sentinel files, so it must
    # not share the module-scoped events_dir with the other tests.
    events_dir = str(tmp_path / "events")
    load_table(spark, sf_dir, "events").repartition(4).write.parquet(
        events_dir
    )
    batch_events = spark.read.parquet(events_dir)
    expected = {
        tuple(r) for r in purchase_attribution_outer(batch_events).collect()
    }
    assert expected
    assert any(r[4] is None for r in expected), "need unattributed rows"

    out = str(tmp_path / "outer_out")
    ckpt = str(tmp_path / "outer_ckpt")

    def run_once():
        stream = stream_from_parquet_dir(spark, events_dir, batch_events.schema)
        res = purchase_attribution_outer(stream, watermark="2 hours")
        assert res.isStreaming
        q = (
            res.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()  # matched pairs + already-expired unmatched rows emit

    # Two sentinel rounds: watermark advances at the END of the batch
    # that reads a sentinel file, and state evicts in the NEXT batch —
    # the second round provides that next batch.
    max_ts = batch_events.agg(F.max("ts")).collect()[0][0]
    for i, hours in enumerate((12, 24)):
        sentinel = spark.createDataFrame(
            [
                (10**12 + 2 * i, max_ts, -1, "click", 0.0, "{}"),
                (10**12 + 2 * i + 1, max_ts, -1, "purchase", 0.0, "{}"),
            ],
            schema=batch_events.schema,
        ).withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {hours} HOURS"))
        sentinel.write.mode("append").parquet(events_dir)
        run_once()

    got = {
        tuple(r)
        for r in spark.read.parquet(out)
        .filter(F.col("user_id") != -1)
        .collect()
    }
    assert got == expected
