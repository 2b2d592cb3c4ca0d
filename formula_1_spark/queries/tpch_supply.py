"""TPC-H supply-relation shapes (Q2/Q9/Q11/Q16/Q20) — the five classic
queries whose canonical form reads ``partsupp``, which the driver schema
does not ship. Each is re-expressed against a *derived* supply relation

    supply(ps_partkey, ps_suppkey, ps_supplycost, ps_availqty) =
        lineitem GROUP BY (l_partkey, l_suppkey)
        [min unit price, total shipped quantity]

so the decision shapes survive intact: Q2's correlated-MIN join-back,
Q9's profit decomposition, Q11's scalar-subquery HAVING threshold,
Q16's NOT-IN supplier exclusion, Q20's nested semi-join chain.

Completes the 22/22 TPC-H battery together with tpch_classic (Q1/3/5/6)
and tpch_extended (Q4/7/8/10/12/13/14/15/17/18/19/21/22).

Determinism: unit price ``l_extendedprice / l_quantity`` is the same IEEE
double division in both engines and MIN is order-independent, so
equality joins on the min cost are bit-stable. Quantity sums are sums of
integral doubles (exact in any order). Money sums accumulate as DECIMAL
then present as double (see tpch_classic._dec_sum). Q9's unit cost proxy
is ``0.6 * p_retailprice`` (a 3-decimal grid value — the double product
casts onto the DECIMAL(18,4) grid identically in both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from formula_1_spark.operators.joins import dim_join
from formula_1_spark.queries.registry import register
from formula_1_spark.queries.tpch_classic import _dec_sum
from formula_1_spark.sources.tables import load_table

_SUPPLY_SQL = """
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         MIN(l_extendedprice / l_quantity) AS ps_supplycost,
         SUM(l_quantity) AS ps_availqty
  FROM lineitem
  GROUP BY l_partkey, l_suppkey
"""


def _supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem-derived stand-in for partsupp: one row per (part,
    supplier) pair ever shipped. Single partial-agg shuffle on the
    compound key — O(|pairs|) state, no row explosion at scale."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_supplycost"),
        F.sum("l_quantity").alias("ps_availqty"),
    )


@register(
    "tpch_q2_min_cost_supplier",
    ops="A1,J1-J3,O3 (TPC-H Q2 shape)",
    doc="Minimum-cost supplier: for each mid-size part, the ASIA "
    "supplier(s) offering the regional minimum unit cost (correlated "
    "MIN subquery decorrelated into a per-part aggregate + equality "
    "join-back), top-100 by account balance.",
    oracle=f"""
WITH supply AS ({_SUPPLY_SQL}),
asian AS (
  SELECT ps.ps_partkey, ps.ps_suppkey, ps.ps_supplycost
  FROM supply ps
  JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = 'ASIA'
),
best AS (
  SELECT a.* FROM asian a
  WHERE a.ps_supplycost = (
    SELECT MIN(a2.ps_supplycost) FROM asian a2
    WHERE a2.ps_partkey = a.ps_partkey)
)
SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_type,
       b.ps_supplycost,
       CAST(ROW_NUMBER() OVER (
         ORDER BY s.s_acctbal DESC, n.n_name ASC, s.s_name ASC,
                  p.p_partkey ASC) AS INTEGER) AS rn
FROM best b
JOIN part p ON p.p_partkey = b.ps_partkey
JOIN supplier s ON s.s_suppkey = b.ps_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE p.p_size BETWEEN 10 AND 20
QUALIFY rn <= 100
""",
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_size").between(10, 20)
    )

    # region-filtered supplier ids: dims joined dim-side, then broadcast
    # against the supply relation (the only big input).
    asian_sup = dim_join(
        supplier, dim_join(nation, region, nation.n_regionkey == region.r_regionkey),
        supplier.s_nationkey == nation.n_nationkey,
    ).select("s_suppkey", "s_acctbal", "s_name", "n_name")

    asian = _supply(spark, sf_dir).join(
        F.broadcast(asian_sup.select(F.col("s_suppkey").alias("as_key"))),
        F.col("ps_suppkey") == F.col("as_key"),
    )
    # per-part regional minimum is |part|-sized -> broadcastable
    min_cost = asian.groupBy(F.col("ps_partkey").alias("mc_partkey")).agg(
        F.min("ps_supplycost").alias("min_cost")
    )
    best = asian.join(
        F.broadcast(min_cost),
        (F.col("ps_partkey") == F.col("mc_partkey"))
        & (F.col("ps_supplycost") == F.col("min_cost")),
    )
    out = dim_join(best, part, best.ps_partkey == part.p_partkey)
    out = dim_join(out, asian_sup, out.ps_suppkey == asian_sup.s_suppkey)
    # part x best-supplier is PART-grain (scales with the catalog), so
    # the top-100 runs two-phase instead of an unpartitioned window.
    from formula_1_spark.operators.windows import two_phase_global_topk

    return two_phase_global_topk(
        out,
        [F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"), F.asc("p_partkey")],
        100,
        alias="rn",
        unique_order=True,  # (s_name, p_partkey) unique per supply row
    ).select(
        "s_acctbal", "s_name", "n_name", "p_partkey", "p_type",
        "ps_supplycost", "rn",
    )


@register(
    "tpch_q9_product_profit",
    ops="J1-J3,A5,F4 (TPC-H Q9 shape)",
    doc="Product-type profit: revenue minus supply cost (0.6 x retail "
    "price per unit as the partsupp cost stand-in) for STANDARD parts, "
    "by supplier nation and order year.",
    oracle="""
SELECT n.n_name AS nation,
       CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))
                - CAST(0.6 * p.p_retailprice * l.l_quantity AS DECIMAL(18,4)))
            AS DOUBLE) AS sum_profit
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE p.p_type = 'STANDARD'
GROUP BY n.n_name, CAST(year(o.o_orderdate) AS INTEGER)
""",
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")

    df = dim_join(li, part, li.l_partkey == part.p_partkey)
    df = dim_join(df, supplier, df.l_suppkey == supplier.s_suppkey)
    df = dim_join(df, nation, df.s_nationkey == nation.n_nationkey)
    # orders is fact-sized: shuffle join on the order key, not broadcast
    df = df.join(orders, df.l_orderkey == orders.o_orderkey)
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    cost = (F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")).cast(
        "decimal(18,4)"
    )
    return (
        df.withColumn("o_year", F.year("o_orderdate").cast("int"))
        .groupBy(F.col("n_name").alias("nation"), "o_year")
        .agg(F.sum(rev - cost).cast("double").alias("sum_profit"))
    )


@register(
    "tpch_q11_important_stock",
    ops="A1,A6 (TPC-H Q11 shape)",
    doc="Important stock identification: parts whose NATION_9-supplied "
    "inventory value exceeds a global-fraction threshold (scalar "
    "aggregate subquery as a HAVING gate).",
    oracle="""
WITH natval AS (
  SELECT l.l_partkey,
         SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS value_dec
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name = 'NATION_9'
  GROUP BY l.l_partkey
)
SELECT l_partkey, CAST(value_dec AS DOUBLE) AS stock_value
FROM natval
WHERE CAST(value_dec AS DOUBLE) >
      (SELECT CAST(SUM(value_dec) AS DOUBLE) * 0.001 FROM natval)
""",
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_9"
    )
    nat_sup = dim_join(
        supplier, nation, supplier.s_nationkey == nation.n_nationkey
    ).select(F.col("s_suppkey").alias("ns_key"))
    natval = (
        li.join(F.broadcast(nat_sup), li.l_suppkey == F.col("ns_key"))
        .groupBy("l_partkey")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("value_dec")
        )
    )
    # decimal-exact global total -> identical double threshold both engines
    threshold = natval.agg(
        (F.sum("value_dec").cast("double") * F.lit(0.001)).alias("thr")
    )
    return (
        natval.join(F.broadcast(threshold), F.lit(True))
        .filter(F.col("value_dec").cast("double") > F.col("thr"))
        .select("l_partkey", F.col("value_dec").cast("double").alias("stock_value"))
    )


@register(
    "tpch_q16_supplier_relationship",
    ops="J-anti,A4 (TPC-H Q16 shape)",
    doc="Parts/supplier relationship: distinct-supplier counts per "
    "(brand, type, size) over square-size parts, excluding one brand and "
    "low-balance suppliers (the NOT-IN complaints exclusion).",
    oracle="""
SELECT p.p_brand, p.p_type, p.p_size,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#5'
  AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
GROUP BY p.p_brand, p.p_type, p.p_size
""",
)
def tpch_q16_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    complainers = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 1000)
        .select(F.col("s_suppkey").alias("bad_key"))
    )
    return (
        li.join(F.broadcast(complainers), li.l_suppkey == F.col("bad_key"), "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_q20_promotion_supplier",
    ops="J-semi,A1 (TPC-H Q20 shape)",
    doc="Potential part promotion: AMERICA suppliers who shipped more "
    "than 30% of their all-time PROMO-part volume during 1998 (nested "
    "semi-join over the derived supply relation).",
    oracle=f"""
WITH supply AS ({_SUPPLY_SQL}),
ship_1998 AS (
  SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty_1998
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1998-01-01'
    AND l_shipdate < TIMESTAMP '1999-01-01'
  GROUP BY l_partkey, l_suppkey
)
SELECT s.s_suppkey, s.s_name, s.s_acctbal
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'AMERICA'
  AND s.s_suppkey IN (
    SELECT y.l_suppkey
    FROM ship_1998 y
    JOIN supply t ON t.ps_partkey = y.l_partkey
                 AND t.ps_suppkey = y.l_suppkey
    JOIN part p ON p.p_partkey = y.l_partkey
    WHERE p.p_type = 'PROMO'
      AND y.qty_1998 > 0.3 * t.ps_availqty)
""",
)
def tpch_q20_promotion_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")

    ship_1998 = (
        li.filter(
            (F.col("l_shipdate") >= "1998-01-01")
            & (F.col("l_shipdate") < "1999-01-01")
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty_1998"))
    )
    # both aggregates hash-partition on the same compound key -> the
    # equi-join below reuses the shuffle (no extra exchange at scale)
    active = (
        ship_1998.join(
            _supply(spark, sf_dir),
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .join(
            F.broadcast(part.select(F.col("p_partkey").alias("pp_key"))),
            F.col("l_partkey") == F.col("pp_key"),
        )
        .filter(F.col("qty_1998") > F.lit(0.3) * F.col("ps_availqty"))
        .select(F.col("l_suppkey").alias("active_key"))
    )
    out = dim_join(
        supplier, dim_join(nation, region, nation.n_regionkey == region.r_regionkey),
        supplier.s_nationkey == nation.n_nationkey,
    )
    return out.join(
        active, out.s_suppkey == F.col("active_key"), "left_semi"
    ).select("s_suppkey", "s_name", "s_acctbal")
