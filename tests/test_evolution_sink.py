"""Schema evolution and streaming-lake sink tests."""

from __future__ import annotations

import os

import pytest

from formula_1_spark.plans.evolution import conform_to_spec, union_evolving
from formula_1_spark.sources.tables import load_table
from formula_1_spark.streaming.sink import stream_to_parquet_lake, with_event_date
from formula_1_spark.streaming.windows import stream_from_parquet_dir


def test_union_evolving_null_fill_and_widening(spark):
    a = spark.createDataFrame([(1, "x", 10)], ["id", "name", "v"])  # v: long
    b = spark.createDataFrame([(2, 2.5)], ["id", "score"])  # new col, missing name/v
    c = spark.createDataFrame([(3, 7.0)], ["id", "v"])  # v drifted to double

    out = union_evolving([a, b, c])
    assert sorted(out.columns) == ["id", "name", "score", "v"]
    assert dict(out.dtypes)["v"] == "double"
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["v"] == 10.0 and rows[1]["score"] is None
    assert rows[2]["name"] is None and rows[2]["score"] == 2.5
    assert rows[3]["v"] == 7.0


def test_union_evolving_rejects_incompatible_drift(spark):
    a = spark.createDataFrame([(1, "x")], ["id", "v"])
    b = spark.createDataFrame([(2, [1, 2])], ["id", "v"])
    with pytest.raises(TypeError, match="incompatible drift"):
        union_evolving([a, b])


def test_conform_to_spec(spark):
    df = spark.createDataFrame([(1, "x", "junk")], ["id", "name", "extra"])
    out = conform_to_spec(df, {"id": "bigint", "name": "string", "added": "double"})
    assert out.columns == ["id", "name", "added"]
    row = out.collect()[0]
    assert row["added"] is None and dict(out.dtypes)["added"] == "double"


def test_stream_to_parquet_lake_partitioned(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    lake = str(tmp_path / "lake")
    ckpt = str(tmp_path / "ckpt")
    events = load_table(spark, sf_dir, "events")
    events.repartition(2).write.mode("overwrite").parquet(src)

    stream = stream_from_parquet_dir(spark, src, spark.read.parquet(src).schema)
    q = stream_to_parquet_lake(
        stream, lake, ckpt, partition_by=["event_date"], transform=with_event_date
    )
    q.awaitTermination(120)

    # Partitioned layout on disk + content parity with the batch source.
    parts = [d for d in os.listdir(lake) if d.startswith("event_date=")]
    assert parts, os.listdir(lake)
    landed = spark.read.parquet(lake)
    assert landed.count() == events.count()
    # Restarting the (availableNow) stream with the same checkpoint must
    # not duplicate data — batch-id fencing.
    stream2 = stream_from_parquet_dir(spark, src, spark.read.parquet(src).schema)
    q2 = stream_to_parquet_lake(
        stream2, lake, ckpt, partition_by=["event_date"], transform=with_event_date
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(lake).count() == events.count()
