"""TPC-H-shaped classics (Q1/Q3/Q5/Q6 adapted to the driver schema) —
the canonical relational-completeness proof, each with a DuckDB oracle.

Float-sum determinism: revenue expressions accumulate as DECIMAL(18,4)
(exact, order-independent, and on-grid for 2dp x 2dp products) and
present as double (see ``streaming.windows.exact_value_sum`` rationale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from formula_1_spark.operators.joins import dim_join
from formula_1_spark.queries.registry import register
from formula_1_spark.sources.tables import load_table


def _dec_sum(col_expr, alias: str):
    # Scale 4, not 2: price (2dp) x discount factor (2dp) products have
    # exactly 4 decimals, so the double->decimal cast lands ON the grid
    # in both engines. At scale 2 the cast rounds a mid-grid value and
    # Spark/DuckDB disagree on ties (observed cent-level drift).
    return F.sum(col_expr.cast("decimal(18,4)")).cast("double").alias(alias)


@register(
    "tpch_q1_pricing_summary",
    ops="A5,P7,O1 (TPC-H Q1 shape)",
    doc="Pricing summary report: grouped sums/avgs over filtered lineitem.",
    oracle="""
SELECT l_returnflag, l_linestatus,
       SUM(l_quantity) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
         AS sum_disc_price,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(1) AS avg_qty,
       COUNT(1) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2002-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "2002-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            _dec_sum(F.col("l_extendedprice"), "sum_base_price"),
            _dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "sum_disc_price"
            ),
            (
                F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "tpch_q3_shipping_priority",
    ops="J1,J2,A5,O3 (TPC-H Q3 shape)",
    doc="Top unshipped-revenue orders for a market segment.",
    oracle="""
WITH rev AS (
  SELECT l.l_orderkey,
         CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)))
              AS DOUBLE) AS revenue,
         CAST(MIN(strftime(o.o_orderdate, '%Y-%m-%d')) AS VARCHAR) AS order_date,
         MIN(o.o_orderpriority) AS priority
  FROM customer c
  JOIN orders o ON c.c_custkey = o.o_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE c.c_mktsegment = 'BUILDING'
    AND o.o_orderdate < TIMESTAMP '2000-01-01'
    AND l.l_shipdate > TIMESTAMP '2000-01-01'
  GROUP BY l.l_orderkey
)
SELECT l_orderkey, revenue, order_date, priority,
       CAST(ROW_NUMBER() OVER (ORDER BY revenue DESC, l_orderkey ASC) AS INTEGER) AS rn
FROM rev
QUALIFY rn <= 10
""",
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")

    base = dim_join(
        orders.filter(F.col("o_orderdate") < "2000-01-01"),
        customer.filter(F.col("c_mktsegment") == "BUILDING"),
        orders.o_custkey == customer.c_custkey,
    )
    base = li.filter(F.col("l_shipdate") > "2000-01-01").join(
        F.broadcast(base), li.l_orderkey == base.o_orderkey
    )
    rev = base.groupBy("l_orderkey").agg(
        _dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
        F.min(F.date_format("o_orderdate", "yyyy-MM-dd")).alias("order_date"),
        F.min("o_orderpriority").alias("priority"),
    )
    # The rollup is ORDER-grain (scales with the fact table), so the
    # top-10 runs two-phase instead of an unpartitioned window;
    # (revenue, l_orderkey) is a total order, so rank == row_number.
    from formula_1_spark.operators.windows import two_phase_global_topk

    return two_phase_global_topk(
        rev, [F.desc("revenue"), F.asc("l_orderkey")], 10, alias="rn",
        unique_order=True,
    )


@register(
    "tpch_q5_local_supplier_volume",
    ops="J1-J3,A5 (TPC-H Q5 shape)",
    doc="Revenue by nation where customer and supplier share the nation "
    "(5-way snowflake join).",
    oracle="""
SELECT n.n_name,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)))
            AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE c.c_nationkey = s.s_nationkey
GROUP BY n.n_name
""",
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    df = dim_join(li, orders, li.l_orderkey == orders.o_orderkey)
    df = dim_join(df, customer, df.o_custkey == customer.c_custkey)
    df = dim_join(df, supplier, df.l_suppkey == supplier.s_suppkey)
    df = dim_join(df, nation, df.s_nationkey == nation.n_nationkey)
    return (
        df.filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name")
        .agg(
            _dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue")
        )
    )


@register(
    "tpch_q6_forecast_revenue",
    ops="P7,A5 (TPC-H Q6 shape)",
    doc="Single-scan filtered revenue aggregate — the pushdown benchmark.",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE)
         AS revenue,
       COUNT(1) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1998-01-01'
  AND l_shipdate < TIMESTAMP '2000-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1998-01-01")
            & (F.col("l_shipdate") < "2000-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _dec_sum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
