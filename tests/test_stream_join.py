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
