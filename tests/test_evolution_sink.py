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


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    """A filter on the partition column must reach the scan as a
    PartitionFilter (directory pruning — the mechanism that turns a
    100 TB scan into a single-day scan), not a post-scan predicate."""
    import contextlib
    import io as _io

    from pyspark.sql import functions as F

    from formula_1_spark.sources.io import write_parquet
    from formula_1_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    path = str(tmp_path / "events_by_date")
    write_parquet(events, path, partition_by=["event_date"])

    one_day = events.select(F.min(F.to_date("ts"))).collect()[0][0]
    df = spark.read.parquet(path).filter(F.col("event_date") == F.lit(one_day))
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    # the partition predicate must be IN the partition filters, and the
    # row-group data filters must not need it
    pf_line = [l for l in plan.splitlines() if "PartitionFilters" in l][0]
    assert "event_date" in pf_line
    assert df.count() > 0
