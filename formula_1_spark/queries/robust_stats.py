"""Robust statistics + time-range window frames.

* ``winsorized_order_stats`` — per-group outlier clipping at exact
  p05/p95 with before/after comparison, the standard robust-mean move
  for quality-score columns. Clipped sums are floor-quantized to cent
  bigints so the aggregate is exact under any accumulation order (a
  float SUM of clipped doubles would differ between engines' window/agg
  association orders).
* ``events_rolling_7d`` — per-user rolling 7-day RANGE frame over event
  time (micros-epoch range bounds, so the frame is a true time interval,
  not a row count). The windowed sum runs on integer cents: Spark
  recomputes moving frames per row while DuckDB uses segment trees —
  different float association orders — so only an integer frame
  aggregate is engine-portable bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from formula_1_spark.queries.registry import register
from formula_1_spark.sources.tables import load_table


@register(
    "winsorized_order_stats",
    ops="EXT-robust-stats,A5,J1 (per-group winsorization)",
    doc="Per-priority winsorization of order totals: exact 5th/95th "
    "percentiles (IEEE-exact interpolation, identical cross-engine) "
    "broadcast back, values clipped with least/greatest, and the "
    "clipped sum reported in floor-quantized CENTS (bigint — exact "
    "under any accumulation order) next to the raw decimal sum and the "
    "clip counts. The audit row a quality-score pipeline wants before "
    "trusting a mean.",
    oracle="""
WITH thr AS (
  SELECT o_orderpriority,
         quantile_cont(o_totalprice, 0.05) AS p05,
         quantile_cont(o_totalprice, 0.95) AS p95
  FROM orders GROUP BY o_orderpriority
)
SELECT o.o_orderpriority,
       CAST(COUNT(1) AS BIGINT) AS n_orders,
       t.p05, t.p95,
       CAST(COUNT(CASE WHEN o.o_totalprice < t.p05 THEN 1 END) AS BIGINT)
         AS n_clipped_low,
       CAST(COUNT(CASE WHEN o.o_totalprice > t.p95 THEN 1 END) AS BIGINT)
         AS n_clipped_high,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS raw_total,
       CAST(SUM(CAST(FLOOR(
           LEAST(GREATEST(o.o_totalprice, t.p05), t.p95) * 100.0)
         AS BIGINT)) AS BIGINT) AS winsorized_cents
FROM orders o JOIN thr t ON t.o_orderpriority = o.o_orderpriority
GROUP BY o.o_orderpriority, t.p05, t.p95
""",
)
def winsorized_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice"
    )
    thr = orders.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", F.lit(0.05)).alias("p05"),
        F.percentile("o_totalprice", F.lit(0.95)).alias("p95"),
    )
    j = orders.join(F.broadcast(thr), "o_orderpriority")
    clipped = F.least(F.greatest(F.col("o_totalprice"), F.col("p05")), F.col("p95"))
    return j.groupBy("o_orderpriority", "p05", "p95").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count(F.when(F.col("o_totalprice") < F.col("p05"), 1)).alias(
            "n_clipped_low"
        ),
        F.count(F.when(F.col("o_totalprice") > F.col("p95"), 1)).alias(
            "n_clipped_high"
        ),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("raw_total"),
        F.sum(F.floor(clipped * F.lit(100.0)).cast("bigint")).alias(
            "winsorized_cents"
        ),
    ).select(
        "o_orderpriority",
        "n_orders",
        "p05",
        "p95",
        "n_clipped_low",
        "n_clipped_high",
        "raw_total",
        "winsorized_cents",
    )


_7D_MICROS = 7 * 24 * 3600 * 1_000_000


@register(
    "events_rolling_7d",
    ops="EXT-range-frame,W1 (time-interval window frame)",
    doc="Per-user rolling 7-day activity over event time: a RANGE frame "
    "on the micros epoch (a true time interval — rows battery elsewhere "
    "covers ROWS frames), counting events and summing value in integer "
    "cents. Integer frame aggregates are the portability contract: "
    "Spark recomputes moving frames sequentially, DuckDB aggregates "
    "them with segment trees, and only exact integers agree under both "
    "association orders.",
    oracle=f"""
SELECT event_id, user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
       CAST(COUNT(1) OVER w AS BIGINT) AS n_7d,
       CAST(SUM(CAST(FLOOR(value * 100.0) AS BIGINT)) OVER w AS BIGINT)
         AS sum_7d_cents
FROM events
WINDOW w AS (
  PARTITION BY user_id ORDER BY epoch_us(ts)
  RANGE BETWEEN {_7D_MICROS} PRECEDING AND CURRENT ROW
)
""",
)
def events_rolling_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-_7D_MICROS, 0)
    )
    return events.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        F.count(F.lit(1)).over(w).alias("n_7d"),
        F.sum(F.floor(F.col("value") * F.lit(100.0)).cast("bigint"))
        .over(w)
        .alias("sum_7d_cents"),
    )
