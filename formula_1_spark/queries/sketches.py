"""Sketch-based approximate aggregates (HyperLogLog++ via
``approx_count_distinct``). The sketch VALUES are engine-specific, so the
oracle can't compare them directly — instead the query emits the exact
distinct counts alongside boolean error-bound flags (|approx - exact| <=
5% of exact, a 5-sigma bound at rsd=0.01), and the oracle asserts the
exact counts hash-exactly and the flags are all true. A wrong or drifting
sketch flips a flag and reds the driver row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from formula_1_spark.queries.registry import register
from formula_1_spark.sources.tables import load_table


@register(
    "approx_distinct_sketch",
    ops="EXT-sketch-hll",
    doc="HyperLogLog++ approximate distinct counts per return flag "
    "(rsd=0.01), oracle-checked via exact counts + 5%-error-bound flags "
    "(sketch values are engine-specific; the bound is what's portable).",
    oracle="""
SELECT l_returnflag,
       COUNT(DISTINCT l_orderkey) AS exact_orders,
       COUNT(DISTINCT l_partkey) AS exact_parts,
       1 AS orders_within_5pct,
       1 AS parts_within_5pct
FROM lineitem
GROUP BY l_returnflag
""",
)
def approx_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # The HLL sketches and the exact distinct counts MUST be separate
    # aggregations: countDistinct rewrites through Expand (one row copy
    # per distinct child), and any HLL aggregate sharing that Aggregate
    # allocates its multi-KB sketch buffer per EXPANDED group — measured
    # ~30 GB of aggregation state / 65 s at sf0.1. Split, each side is a
    # plain one-shuffle agg; the 3-row join-back is free.
    approx = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("a_orders"),
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("a_parts"),
    )
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )
    within = lambda a, e: (  # noqa: E731
        F.abs(F.col(a) - F.col(e)) <= F.col(e) * F.lit(0.05)
    ).cast("int")
    return approx.join(exact, "l_returnflag").select(
        "l_returnflag",
        "exact_orders",
        "exact_parts",
        within("a_orders", "exact_orders").alias("orders_within_5pct"),
        within("a_parts", "exact_parts").alias("parts_within_5pct"),
    )


@register(
    "approx_quantile_sketch",
    ops="EXT-sketch-quantile",
    doc="Approximate percentiles (Greenwald-Khanna-class sketch via "
    "percentile_approx, accuracy=1000) per return flag, oracle-checked "
    "via exact percentiles + sandwich flags: the sketch p50/p95 must lie "
    "within the exact [p49,p51]/[p94,p96] bands (rank error <= 1/accuracy "
    "guarantees it). Sketch values themselves are engine-specific.",
    oracle="""
SELECT l_returnflag,
       quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.50) AS exact_p50,
       quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.95) AS exact_p95,
       1 AS p50_in_band,
       1 AS p95_in_band
FROM lineitem
GROUP BY l_returnflag
""",
)
def approx_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("double")
    # ONE array-percentile aggregate (single sort buffer per group), not
    # six scalar percentile aggs (six buffered copies of every value).
    agg = li.groupBy("l_returnflag").agg(
        F.percentile_approx(price, [0.50, 0.95], 1000).alias("aq"),
        F.percentile(price, [0.49, 0.50, 0.51, 0.94, 0.95, 0.96]).alias("eq"),
    )
    band = lambda a, lo, hi: ((a >= lo) & (a <= hi)).cast("int")  # noqa: E731
    return agg.select(
        "l_returnflag",
        F.col("eq")[1].alias("exact_p50"),
        F.col("eq")[4].alias("exact_p95"),
        band(F.col("aq")[0], F.col("eq")[0], F.col("eq")[2]).alias("p50_in_band"),
        band(F.col("aq")[1], F.col("eq")[3], F.col("eq")[5]).alias("p95_in_band"),
    )
