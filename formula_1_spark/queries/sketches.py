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
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("a_orders"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("a_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )
    within = lambda a, e: (  # noqa: E731
        F.abs(F.col(a) - F.col(e)) <= F.col(e) * F.lit(0.05)
    ).cast("int")
    return agg.select(
        "l_returnflag",
        "exact_orders",
        "exact_parts",
        within("a_orders", "exact_orders").alias("orders_within_5pct"),
        within("a_parts", "exact_parts").alias("parts_within_5pct"),
    )
