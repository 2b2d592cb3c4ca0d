"""Stateful streaming (applyInPandasWithState) and bucketed-join tests."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from formula_1_spark.sources.tables import load_table
from formula_1_spark.streaming.stateful import running_user_totals
from formula_1_spark.streaming.windows import stream_from_parquet_dir


def test_stateful_running_totals(spark, sf_dir, tmp_path):
    src = str(tmp_path / "events_src")
    events = load_table(spark, sf_dir, "events")
    events.repartition(3).write.mode("overwrite").parquet(src)

    stream = stream_from_parquet_dir(spark, src, spark.read.parquet(src).schema)
    out = running_user_totals(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("user_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # Last update per user must equal the batch aggregate.
    got = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 6))
        for r in spark.sql(
            "SELECT * FROM user_totals WHERE finalized = false"
        ).collect()
    }
    expected = {
        r["user_id"]: (r["n"], round(r["t"], 6))
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("t"))
        .collect()
    }
    # The memory sink (update mode) may hold several updates per user;
    # the MAX n_events row is the final state.
    finals = {}
    for r in spark.sql("SELECT * FROM user_totals WHERE finalized = false").collect():
        cur = finals.get(r["user_id"])
        if cur is None or r["n_events"] > cur[0]:
            finals[r["user_id"]] = (r["n_events"], round(r["total_value"], 6))
    assert finals == expected


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    from formula_1_spark.sources.io import write_bucketed_table

    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed_table(li, "li_b", ["l_orderkey"], n_buckets=8, sort_cols=["l_orderkey"])
    write_bucketed_table(orders, "o_b", ["o_orderkey"], n_buckets=8, sort_cols=["o_orderkey"])

    a = spark.table("li_b")
    b = spark.table("o_b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        joined = a.join(b, a.l_orderkey == b.o_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # Co-located buckets: the join must not shuffle either side.
        assert "Exchange hashpartitioning" not in plan, plan[:2000]
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS o_b")
