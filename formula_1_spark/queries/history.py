"""Dimension-history and streaming-dedup operators (round 5 extensions).

* ``scd2_customer_priority`` — classic lakehouse SCD Type 2 build: turn
  a change stream (each customer's order-priority choices over time)
  into versioned validity intervals (effective_from / effective_to /
  is_current). Run-collapse via lag + cumulative flag sum, windows
  partitioned per customer — the key is as spreadable as the customer
  dimension, so no global window anywhere.
* ``stream_dedup_watermark`` — ``dropDuplicatesWithinWatermark`` E2E
  through the driver gate: a file stream re-serves events with exact
  duplicate rows injected in a SECOND wave of files, the dedup operator
  collapses them across micro-batches, and the drained result must
  agree bit-for-bit with batch ``DISTINCT`` SQL. The watermark is set
  wider than the fixture's event-time span so no row is late-dropped —
  the batch oracle is then exact; in production the same operator
  bounds its key state to the watermark horizon (see
  ``streaming/windows.py:stream_dedup``).

Reference scope note: the reference has neither a lake-history nor a
streaming surface (SURVEY.md §2.9 marks streaming as an engine
extension); these extend the cdc/lake slate in
``queries/cdc_stream.py`` and ``sources/io.py``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from formula_1_spark.queries.registry import register
from formula_1_spark.sources.fixtures import building_dir, fixture_root, publish
from formula_1_spark.sources.tables import fan_out, load_table
from formula_1_spark.streaming.windows import stream_dedup

_OPEN_END = "9999-12-31 00:00:00"
_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"
_SCD2_SAMPLE_MOD = 25  # audit sample: every 25th customer


@register(
    "scd2_customer_priority",
    ops="EXT-scd2,W1,A1,P6 (SCD Type 2 interval build from a change log)",
    doc="SCD Type 2 dimension build: each customer's order-priority "
    "history becomes versioned validity intervals — consecutive same-"
    "priority runs collapse (lag + cumulative new-run flag), each run "
    "gets effective_from = first order ts, effective_to = next run's "
    "start (open intervals pinned to 9999-12-31), is_current on the "
    "last. All windows partition by customer; a deterministic 1-in-25 "
    "customer sample keeps the audit output bounded.",
    oracle=f"""
WITH seq AS (
  SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
         lag(o_orderpriority) OVER
           (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
           AS prev_priority
  FROM orders
  WHERE o_custkey % {_SCD2_SAMPLE_MOD} = 0
),
flagged AS (
  SELECT *,
         CAST(SUM(CASE WHEN prev_priority IS NULL
                        OR prev_priority <> o_orderpriority
                       THEN 1 ELSE 0 END) OVER
           (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS version
  FROM seq
),
runs AS (
  SELECT o_custkey AS custkey, version,
         MIN(o_orderpriority) AS priority,
         MIN(o_orderdate) AS eff_from_ts,
         CAST(COUNT(1) AS BIGINT) AS n_orders
  FROM flagged GROUP BY o_custkey, version
)
SELECT custkey, version, priority,
       strftime(eff_from_ts, '{_TS_FMT_DUCK}') AS effective_from,
       COALESCE(
         strftime(lead(eff_from_ts) OVER
                    (PARTITION BY custkey ORDER BY version),
                  '{_TS_FMT_DUCK}'),
         '{_OPEN_END}') AS effective_to,
       n_orders,
       CAST(CASE WHEN version = MAX(version) OVER (PARTITION BY custkey)
                 THEN 1 ELSE 0 END AS INTEGER) AS is_current
FROM runs
ORDER BY custkey, version
""",
)
def scd2_customer_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = fan_out(load_table(spark, sf_dir, "orders")).filter(
        F.col("o_custkey") % _SCD2_SAMPLE_MOD == 0
    )
    order_w = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey"
    )
    flagged = orders.withColumn(
        "prev_priority", F.lag("o_orderpriority").over(order_w)
    ).withColumn(
        "version",
        F.sum(
            F.when(
                F.col("prev_priority").isNull()
                | (F.col("prev_priority") != F.col("o_orderpriority")),
                1,
            ).otherwise(0)
        )
        .over(order_w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint"),
    )
    runs = flagged.groupBy(
        F.col("o_custkey").alias("custkey"), "version"
    ).agg(
        F.min("o_orderpriority").alias("priority"),
        F.min("o_orderdate").alias("eff_from_ts"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    ver_w = Window.partitionBy("custkey").orderBy("version")
    return (
        runs.select(
            "custkey",
            "version",
            "priority",
            F.date_format("eff_from_ts", _TS_FMT_SPARK).alias(
                "effective_from"
            ),
            F.coalesce(
                F.date_format(
                    F.lead("eff_from_ts").over(ver_w), _TS_FMT_SPARK
                ),
                F.lit(_OPEN_END),
            ).alias("effective_to"),
            "n_orders",
            F.when(
                F.col("version")
                == F.max("version").over(Window.partitionBy("custkey")),
                1,
            )
            .otherwise(0)
            .cast("int")
            .alias("is_current"),
        )
        .orderBy("custkey", "version")
    )


def _stream_dedup_fixture(spark: SparkSession, sf_dir: str) -> str:
    """Run the dedup stream once per (sf_dir, events) fixture epoch:
    events written as 4 parquet files, an exact replay of every 3rd
    event written as 4 MORE files, drained through
    dropDuplicatesWithinWatermark into a memory sink, result persisted.
    Duplicates are byte-identical rows, so whichever copy survives, the
    output is deterministic."""
    root = fixture_root("stream_dedup_v1", sf_dir, "events")
    result = os.path.join(root, "result")
    if os.path.isdir(result):
        return result
    scratch = building_dir(root)
    os.makedirs(scratch, exist_ok=True)
    src = os.path.join(scratch, "src")
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    events.repartition(4).write.mode("overwrite").parquet(src)
    events.filter(F.col("event_id") % 3 == 0).repartition(4).write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema(
            "event_id BIGINT, ts TIMESTAMP, user_id BIGINT,"
            " event_type STRING, value DOUBLE"
        )
        .option("maxFilesPerTrigger", "3")
        .parquet(src)
    )
    # Watermark wider than the fixture's event-time span: nothing is
    # late-dropped, so the stream result equals batch DISTINCT exactly.
    # Production sizing would use the real out-of-orderness bound and
    # the state store would hold only that horizon per key.
    deduped = stream_dedup(stream, ["event_id"], watermark="3650 days")
    name = f"stream_dedup_{os.getpid()}"
    q = (
        deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(scratch, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise RuntimeError(
            "availableNow stream did not drain within 300s; "
            "refusing to publish a partial fixture"
        )
    final = (
        spark.table(name)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.floor(F.col("value") * 100).cast("bigint")).alias(
                "value_cents"
            ),
        )
    )
    final.write.mode("overwrite").parquet(os.path.join(scratch, "result"))
    publish(scratch, root)
    return result


@register(
    "stream_dedup_watermark",
    ops="STREAM-dedup (dropDuplicatesWithinWatermark E2E)",
    doc="Streaming exact dedup through the gate: a file stream re-serves "
    "events plus an exact replay of every 3rd row in later files; "
    "dropDuplicatesWithinWatermark(event_id) collapses them across "
    "micro-batches; the drained per-type totals must equal batch "
    "DISTINCT SQL bit-for-bit (integer-cents sums, so accumulation "
    "order can't show).",
    oracle="""
SELECT event_type,
       CAST(COUNT(1) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT)
         AS value_cents
FROM events
GROUP BY event_type
""",
)
def stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    result = _stream_dedup_fixture(spark, sf_dir)
    return spark.read.parquet(result)
