"""Join-type breadth beyond the reference's inner-only surface
(SURVEY §2.3 notes the absence): left outer, left semi, left anti —
each with a DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from formula_1_spark.queries.registry import register
from formula_1_spark.sources.tables import load_table


@register(
    "customers_left_join_orders",
    ops="J-left,A5",
    doc="LEFT OUTER: every customer with order count (0 for orderless) "
    "and total spend.",
    oracle="""
SELECT c.c_custkey, c.c_name,
       COUNT(o.o_orderkey) AS n_orders,
       CAST(SUM(CAST(coalesce(o.o_totalprice, 0) AS DECIMAL(18,2))) AS DOUBLE)
         AS total_spend
FROM customer c
LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey, c.c_name
""",
)
def customers_left_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    joined = customer.join(
        orders, orders.o_custkey == customer.c_custkey, "left"
    )
    return joined.groupBy("c_custkey", "c_name").agg(
        F.count("o_orderkey").alias("n_orders"),
        F.sum(F.coalesce(F.col("o_totalprice"), F.lit(0)).cast("decimal(18,2)"))
        .cast("double")
        .alias("total_spend"),
    )


@register(
    "customers_semi_anti",
    ops="J-semi,J-anti,SET-union",
    doc="LEFT SEMI (customers with >= 1 order in 1998) UNION ALL LEFT "
    "ANTI (customers with none), tagged.",
    oracle="""
WITH in98 AS (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1998)
SELECT c_custkey, 'active' AS segment FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM in98)
UNION ALL
SELECT c_custkey, 'dormant' AS segment FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM in98)
""",
)
def customers_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders98 = (
        load_table(spark, sf_dir, "orders")
        .filter(F.year("o_orderdate") == 1998)
        .select("o_custkey")
    )
    semi = customer.join(
        orders98, customer.c_custkey == orders98.o_custkey, "left_semi"
    ).select("c_custkey", F.lit("active").alias("segment"))
    anti = customer.join(
        orders98, customer.c_custkey == orders98.o_custkey, "left_anti"
    ).select("c_custkey", F.lit("dormant").alias("segment"))
    return semi.unionAll(anti)


@register(
    "skew_salted_join",
    ops="EXT-skew-salting,J4,A5",
    doc="Skew-mitigated join: lineitem keyed by l_returnflag (3 values — "
    "a pathologically skewed key where every row lands on one of three "
    "reducers) joined to a tiny flag-description dim through salted_join "
    "(16 salts spread each hot key across reducers), then re-aggregated. "
    "Salting is value-neutral: the oracle is the plain join.",
    oracle="""
SELECT v.flag_label,
       COUNT(1) AS n_lines,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         AS total_price
FROM lineitem l
JOIN (VALUES ('A', 'accepted'), ('N', 'open'), ('R', 'returned'))
     v(l_returnflag, flag_label)
  ON v.l_returnflag = l.l_returnflag
GROUP BY v.flag_label
""",
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.operators.joins import salted_join

    li = load_table(spark, sf_dir, "lineitem")
    flag_dim = spark.createDataFrame(
        [("A", "accepted"), ("N", "open"), ("R", "returned")],
        ["l_returnflag", "flag_label"],
    )
    joined = salted_join(li, flag_dim, key="l_returnflag", n_salts=16)
    return joined.groupBy("flag_label").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_price"),
    )
