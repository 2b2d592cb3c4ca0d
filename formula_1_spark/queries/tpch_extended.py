"""TPC-H-shaped extended battery (Q4/Q7/Q8/Q10/Q12/Q13/Q14/Q15/Q17/
Q18/Q19/Q21/Q22 shapes
adapted to the driver schema, which has no partsupp/commitdate/shipmode/
container columns) — relational breadth: EXISTS semi-joins, nation-pair
multi-joins, conditional-ratio aggregates, zero-preserving outer-join
histograms, correlated scalar-aggregate subqueries, HAVING-gated
IN-subqueries, and anti-joins against scalar thresholds.

Determinism: every float aggregate accumulates as DECIMAL then presents
as double (see tpch_classic._dec_sum); averages divide a decimal-exact
sum by a count on both engines; rankings tie-break on unique keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from formula_1_spark.operators.joins import dim_join
from formula_1_spark.queries.registry import register
from formula_1_spark.queries.tpch_classic import _dec_sum
from formula_1_spark.sources.tables import load_table


def _dec_avg(col_expr, alias: str, scale: int = 2):
    """Order-independent average: decimal-exact sum / count, both cast the
    same way in the oracle SQL."""
    return (
        F.sum(col_expr.cast(f"decimal(18,{scale})")).cast("double")
        / F.count(F.lit(1))
    ).alias(alias)


@register(
    "tpch_q4_priority_exists",
    ops="J-semi,A3 (TPC-H Q4 shape)",
    doc="Order-priority checking: orders with ANY heavy line (qty > 45) "
    "via EXISTS semi-join, counted by priority.",
    oracle="""
SELECT o.o_orderpriority, COUNT(1) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1999-01-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45
  )
GROUP BY o.o_orderpriority
""",
)
def tpch_q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        orders.filter(
            (F.col("o_orderdate") >= "1997-01-01")
            & (F.col("o_orderdate") < "1999-01-01")
        )
        .join(
            li.filter(F.col("l_quantity") > 45),
            orders.o_orderkey == li.l_orderkey,
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "tpch_q7_volume_shipping",
    ops="J1-J3,A3,F4 (TPC-H Q7 shape)",
    doc="Nation-pair trade volume: revenue between NATION_1 and NATION_2 "
    "in either direction, by supplier nation / customer nation / year.",
    oracle="""
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)))
            AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation ns ON s.s_nationkey = ns.n_nationkey
JOIN nation nc ON c.c_nationkey = nc.n_nationkey
WHERE (ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
   OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1')
GROUP BY ns.n_name, nc.n_name, CAST(year(l.l_shipdate) AS INTEGER)
""",
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    ns = nation.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    nc = nation.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("cust_nation")
    )
    df = dim_join(li, orders, li.l_orderkey == orders.o_orderkey)
    df = dim_join(df, customer, df.o_custkey == customer.c_custkey)
    df = dim_join(df, supplier, df.l_suppkey == supplier.s_suppkey)
    df = dim_join(df, ns, df.s_nationkey == ns.ns_key)
    df = dim_join(df, nc, df.c_nationkey == nc.nc_key)
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        df.filter(pair)
        .withColumn("l_year", F.year("l_shipdate").cast("int"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(_dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


@register(
    "tpch_q8_market_share",
    ops="J1-J3,A3 (TPC-H Q8 shape)",
    doc="Market share: NATION_3 suppliers' fraction of PROMO-part revenue "
    "sold into ASIA customers, by year — a conditional-ratio aggregate.",
    oracle="""
SELECT CAST(year(l.l_shipdate) AS INTEGER) AS o_year,
       CAST(SUM(CASE WHEN ns.n_name = 'NATION_3'
                     THEN CAST(l.l_extendedprice * (1 - l.l_discount)
                               AS DECIMAL(18,4))
                     ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
         / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,4))) AS DOUBLE) AS mkt_share
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation nc ON c.c_nationkey = nc.n_nationkey
JOIN region r ON nc.n_regionkey = r.r_regionkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation ns ON s.s_nationkey = ns.n_nationkey
WHERE p.p_type = 'PROMO' AND r.r_name = 'ASIA'
GROUP BY CAST(year(l.l_shipdate) AS INTEGER)
""",
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")

    nc = nation.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_regionkey").alias("nc_region")
    )
    ns = nation.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    df = dim_join(li, part, li.l_partkey == part.p_partkey)
    df = dim_join(df, orders, df.l_orderkey == orders.o_orderkey)
    df = dim_join(df, customer, df.o_custkey == customer.c_custkey)
    df = dim_join(df, nc, df.c_nationkey == nc.nc_key)
    df = dim_join(df, region, df.nc_region == region.r_regionkey)
    df = dim_join(df, supplier, df.l_suppkey == supplier.s_suppkey)
    df = dim_join(df, ns, df.s_nationkey == ns.ns_key)
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        df.withColumn("o_year", F.year("l_shipdate").cast("int"))
        .groupBy("o_year")
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(zero)
                ).cast("double")
                / F.sum(vol).cast("double")
            ).alias("mkt_share")
        )
    )


@register(
    "tpch_q10_returned_items",
    ops="J1-J3,A5,O3 (TPC-H Q10 shape)",
    doc="Returned-item reporting: top-20 customers by lost revenue "
    "(l_returnflag = 'R') in a quarter window.",
    oracle="""
WITH rev AS (
  SELECT c.c_custkey, c.c_name, n.n_name,
         CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)))
              AS DOUBLE) AS revenue
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  WHERE l.l_returnflag = 'R'
    AND o.o_orderdate >= TIMESTAMP '1999-01-01'
    AND o.o_orderdate < TIMESTAMP '2000-01-01'
  GROUP BY c.c_custkey, c.c_name, n.n_name
)
SELECT c_custkey, c_name, n_name, revenue,
       CAST(ROW_NUMBER() OVER (ORDER BY revenue DESC, c_custkey ASC) AS INTEGER) AS rn
FROM rev
QUALIFY rn <= 20
""",
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")

    df = dim_join(
        li.filter(F.col("l_returnflag") == "R"),
        orders.filter(
            (F.col("o_orderdate") >= "1999-01-01")
            & (F.col("o_orderdate") < "2000-01-01")
        ),
        li.l_orderkey == orders.o_orderkey,
    )
    df = dim_join(df, customer, df.o_custkey == customer.c_custkey)
    df = dim_join(df, nation, df.c_nationkey == nation.n_nationkey)
    rev = df.groupBy("c_custkey", "c_name", "n_name").agg(
        _dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue")
    )
    # (revenue, c_custkey) is a total order, so competition rank ==
    # row_number; the two-phase operator keeps the top-k ordering
    # distributed instead of a single-partition window over the rollup.
    from formula_1_spark.operators.windows import two_phase_global_topk

    return two_phase_global_topk(
        rev, [F.desc("revenue"), F.asc("c_custkey")], 20, alias="rn",
        unique_order=True,
    )


@register(
    "tpch_q13_order_histogram",
    ops="J-left,A3 (TPC-H Q13 shape)",
    doc="Customer order-count distribution INCLUDING zero-order customers "
    "(zero-preserving left join -> double aggregation).",
    oracle="""
WITH per_cust AS (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
SELECT c_count, COUNT(1) AS custdist
FROM per_cust
GROUP BY c_count
""",
)
def tpch_q13_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "tpch_q17_small_quantity_revenue",
    ops="J4,A1 (TPC-H Q17 shape)",
    doc="Small-quantity-order revenue for Brand#11 parts: lines below "
    "0.2x the part's average quantity (correlated scalar-aggregate "
    "subquery, decorrelated into a pre-aggregate join).",
    oracle="""
WITH part_avg AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(1)
           AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         / CAST(7.0 AS DOUBLE) AS avg_yearly,
       COUNT(1) AS n_lines
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN part_avg a ON a.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#11'
  AND l.l_quantity < CAST(0.2 AS DOUBLE) * a.avg_qty
""",
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#11")
    part_avg = li.groupBy(F.col("l_partkey").alias("pa_key")).agg(
        _dec_avg(F.col("l_quantity"), "avg_qty")
    )
    df = dim_join(li, part, li.l_partkey == part.p_partkey)
    # the per-part aggregate is |part|-sized — broadcast it like a dim
    df = dim_join(df, part_avg, df.l_partkey == part_avg.pa_key)
    return df.filter(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty")).agg(
        (
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
            / F.lit(7.0)
        ).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "tpch_q18_large_orders",
    ops="J4,A6,O3 (TPC-H Q18 shape)",
    doc="Large-volume orders: orders whose lines sum to > 180 units "
    "(HAVING-gated IN-subquery shape), top-20 by order total price.",
    oracle="""
WITH big AS (
  SELECT l_orderkey, SUM(l_quantity) AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 180
)
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
       o.o_totalprice, b.sum_qty,
       CAST(ROW_NUMBER() OVER (
         ORDER BY o.o_totalprice DESC, o.o_orderkey ASC) AS INTEGER) AS rn
FROM big b
JOIN orders o ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
QUALIFY rn <= 20
""",
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    # integral-valued doubles: SUM is exact in any order, HAVING is safe
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 180)
    )
    df = dim_join(orders, big, orders.o_orderkey == big.l_orderkey)
    df = dim_join(df, customer, df.o_custkey == customer.c_custkey)
    # (o_totalprice, o_orderkey) is a total order: rank == row_number, and
    # the two-phase top-k avoids an unpartitioned window over the HAVING
    # survivors (still order-count-scale at 100 TB).
    from formula_1_spark.operators.windows import two_phase_global_topk

    return two_phase_global_topk(
        df.withColumn("order_date", F.date_format("o_orderdate", "yyyy-MM-dd")),
        [F.desc("o_totalprice"), F.asc("o_orderkey")],
        20,
        alias="rn",
        unique_order=True,
    ).select(
        "c_name", "c_custkey", "o_orderkey", "order_date",
        "o_totalprice", "sum_qty", "rn",
    )


@register(
    "tpch_q22_global_sales_opportunity",
    ops="J-anti,A3 (TPC-H Q22 shape)",
    doc="Sales opportunity: customers above the positive-balance average "
    "with no URGENT orders (scalar-subquery threshold + anti-join), by "
    "nation. (Every sf0.01 customer has at least one order, so the "
    "classic no-orders predicate would be vacuous at the correctness "
    "scale — the priority-restricted anti-join keeps real rows flowing.)",
    oracle="""
WITH threshold AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(1)
           AS avg_bal
  FROM customer WHERE c_acctbal > 0
)
SELECT c.c_nationkey, COUNT(1) AS numcust,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer c, threshold t
WHERE c.c_acctbal > t.avg_bal
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
  )
GROUP BY c.c_nationkey
""",
)
def tpch_q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    threshold = customer.filter(F.col("c_acctbal") > 0).agg(
        _dec_avg(F.col("c_acctbal"), "avg_bal")
    )
    # 1-row scalar threshold broadcast against every customer row — the
    # distributed form of a scalar subquery.
    return (
        customer.join(F.broadcast(threshold), F.lit(True))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            orders.filter(F.col("o_orderpriority") == "1-URGENT"),
            customer.c_custkey == orders.o_custkey,
            "left_anti",
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("totacctbal"),
        )
    )


@register(
    "tpch_q12_late_shipment_priority",
    ops="J1,A3,F4 (TPC-H Q12 shape)",
    doc="Late-shipment priority audit (Q12 without shipmode/receiptdate: "
    "lateness = shipped > 90 days after order date, classed by return "
    "flag): conditional high/low-priority line counts per class.",
    oracle="""
SELECT l.l_returnflag AS ship_class,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_priority_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_priority_count
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
GROUP BY l.l_returnflag
""",
)
def tpch_q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_priority_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_priority_count"),
        )
    )


@register(
    "tpch_q14_promo_revenue",
    ops="J1,A3,F5 (TPC-H Q14 shape)",
    doc="Promotion-effect ratio: share of one month's revenue from PROMO "
    "parts; both sums decimal-exact so the percentage is bit-stable.",
    oracle="""
SELECT 100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                 THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))
                 ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
       / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)))
              AS DOUBLE) AS promo_revenue_pct
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1998-06-01'
  AND l.l_shipdate < TIMESTAMP '1998-07-01'
""",
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(18,4)"))
    return (
        li.filter(
            (F.col("l_shipdate") >= "1998-06-01") & (F.col("l_shipdate") < "1998-07-01")
        )
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (
                F.lit(100.0) * F.sum(promo).cast("double")
                / F.sum(rev).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "tpch_q15_top_supplier",
    ops="A1,W2,J1 (TPC-H Q15 shape)",
    doc="Top supplier(s) by quarterly revenue: pre-aggregated revenue "
    "relation, global max via scalar comparison (the Q15 view + MAX "
    "subquery), supplier dim join-back. The global window runs on the "
    "POST-aggregation relation (one row per supplier) — the W2-safe shape.",
    oracle="""
WITH rev AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
              AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1998-01-01'
    AND l_shipdate < TIMESTAMP '1998-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
""",
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= "1998-01-01") & (F.col("l_shipdate") < "1998-04-01")
        )
        .groupBy("l_suppkey")
        .agg(_dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue"))
    )
    w = Window.partitionBy()
    top = rev.withColumn("mx", F.max("total_revenue").over(w)).filter(
        F.col("total_revenue") == F.col("mx")
    )
    return top.join(F.broadcast(sup), top.l_suppkey == sup.s_suppkey).select(
        "s_suppkey", "s_name", "total_revenue"
    )


@register(
    "tpch_q19_disjunctive_revenue",
    ops="J1,P7,F3 (TPC-H Q19 shape)",
    doc="Discounted revenue under an OR-of-ANDs predicate (brand x size "
    "x quantity bands — Q19 without container/shipmode); exercises "
    "disjunctive predicate planning over a joined dim.",
    oracle="""
SELECT CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)))
            AS DOUBLE) AS revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#9' AND p.p_size BETWEEN 20 AND 50
       AND l.l_quantity BETWEEN 20 AND 30)
""",
)
def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")

    def band(brand, s_lo, s_hi, q_lo, q_hi):
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(s_lo, s_hi)
            & F.col("l_quantity").between(q_lo, q_hi)
        )

    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(
            band("Brand#1", 1, 15, 1, 11)
            | band("Brand#2", 10, 30, 10, 20)
            | band("Brand#9", 20, 50, 20, 30)
        )
        .agg(_dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


@register(
    "tpch_q21_waiting_supplier",
    ops="J-semi,J-anti,A1 (TPC-H Q21 shape)",
    doc="Suppliers who alone shipped late on finished multi-supplier "
    "orders (Q21's EXISTS + NOT EXISTS pair, lateness = shipped > 60 "
    "days after order date): distinct-order count per supplier.",
    oracle="""
WITH lo AS (
  SELECT l.l_orderkey, l.l_suppkey, l.l_shipdate, o.o_orderdate
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'
),
late AS (
  SELECT * FROM lo WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
)
SELECT s.s_name, COUNT(DISTINCT l1.l_orderkey) AS numwait
FROM late l1 JOIN supplier s ON s.s_suppkey = l1.l_suppkey
WHERE EXISTS (
    SELECT 1 FROM lo l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM late l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
  )
GROUP BY s.s_name
""",
)
def tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    sup = load_table(spark, sf_dir, "supplier")
    lo = (
        li.join(
            orders.filter(F.col("o_orderstatus") == "F").select(
                "o_orderkey", "o_orderdate"
            ),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .select("l_orderkey", "l_suppkey", "l_shipdate", "o_orderdate")
    )
    late = lo.filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    ).select("l_orderkey", "l_suppkey")
    others = lo.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    late_others = late.select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3")
    )
    waiting = (
        late.join(
            others,
            (F.col("l_orderkey") == F.col("k2")) & (F.col("l_suppkey") != F.col("s2")),
            "left_semi",
        )
        .join(
            late_others,
            (F.col("l_orderkey") == F.col("k3")) & (F.col("l_suppkey") != F.col("s3")),
            "left_anti",
        )
    )
    return (
        waiting.join(F.broadcast(sup), waiting.l_suppkey == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
    )
