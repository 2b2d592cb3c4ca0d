"""Sketch-based approximate aggregates (HyperLogLog++ via
``approx_count_distinct``). Approximations are engine-specific, so there
is no value-exact oracle — these register with ``oracle=None`` and get
the driver's rows-only check; the pytest suite bounds the relative error
against exact counts instead.
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
    "(rsd=0.01). No SQL oracle (engine-specific sketch); rows-only check "
    "+ error-bound pytest.",
    oracle=None,
)
def approx_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx_orders"),
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_parts"),
    )
