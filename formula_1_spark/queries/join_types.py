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


@register(
    "customer_yoy_full_outer",
    ops="J-full,A1,P6 (full-outer reconciliation)",
    doc="FULL OUTER completes the join matrix (inner/left/semi/anti "
    "covered elsewhere): per-customer 1997 vs 1998 spend aggregates "
    "reconciled side-by-side; customers active in only one year surface "
    "with a NULL side and a churn status derived from which side "
    "matched. Both inputs pre-aggregate before the join (A1), so the "
    "full-outer runs on one row per customer per side.",
    oracle="""
WITH y97 AS (
  SELECT o_custkey, CAST(COUNT(1) AS BIGINT) AS n_97,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend_97
  FROM orders WHERE year(o_orderdate) = 1997 GROUP BY o_custkey
),
y98 AS (
  SELECT o_custkey, CAST(COUNT(1) AS BIGINT) AS n_98,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend_98
  FROM orders WHERE year(o_orderdate) = 1998 GROUP BY o_custkey
)
SELECT COALESCE(a.o_custkey, b.o_custkey) AS custkey,
       a.n_97, a.spend_97, b.n_98, b.spend_98,
       CASE WHEN a.o_custkey IS NULL THEN 'new'
            WHEN b.o_custkey IS NULL THEN 'churned'
            ELSE 'retained' END AS status
FROM y97 a FULL OUTER JOIN y98 b ON a.o_custkey = b.o_custkey
""",
)
def customer_yoy_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")

    def year_agg(y: int, key_col: str, n_col: str, s_col: str) -> DataFrame:
        return (
            orders.filter(F.year("o_orderdate") == y)
            .groupBy(F.col("o_custkey").alias(key_col))
            .agg(
                F.count(F.lit(1)).alias(n_col),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("double")
                .alias(s_col),
            )
        )

    a = year_agg(1997, "ck_97", "n_97", "spend_97")
    b = year_agg(1998, "ck_98", "n_98", "spend_98")
    joined = a.join(b, F.col("ck_97") == F.col("ck_98"), "full_outer")
    return joined.select(
        F.coalesce(F.col("ck_97"), F.col("ck_98")).alias("custkey"),
        "n_97",
        "spend_97",
        "n_98",
        "spend_98",
        F.when(F.col("ck_97").isNull(), F.lit("new"))
        .when(F.col("ck_98").isNull(), F.lit("churned"))
        .otherwise(F.lit("retained"))
        .alias("status"),
    )


# ---------------------------------------------------------------------------
# NOT IN null-trap battery (round 10)
# ---------------------------------------------------------------------------

_NIN_SQL = """
WITH keys AS (
  SELECT CASE WHEN o_orderkey % 97 = 0 THEN NULL ELSE o_custkey END AS k
  FROM orders WHERE year(o_orderdate) = 1998
),
ne AS (
  SELECT c_mktsegment, COUNT(*) AS n FROM customer c
  WHERE NOT EXISTS (SELECT 1 FROM keys x WHERE x.k = c.c_custkey)
  GROUP BY c_mktsegment
),
ni AS (
  SELECT c_mktsegment, COUNT(*) AS n FROM customer
  WHERE c_custkey NOT IN (SELECT k FROM keys)
  GROUP BY c_mktsegment
),
base AS (SELECT c_mktsegment, COUNT(*) AS n FROM customer GROUP BY c_mktsegment)
SELECT b.c_mktsegment,
       CAST(b.n AS BIGINT) AS n_customers,
       CAST(COALESCE(ne.n, 0) AS BIGINT) AS n_not_exists,
       CAST(COALESCE(ni.n, 0) AS BIGINT) AS n_not_in,
       COALESCE(ni.n, 0) = 0 AS not_in_null_trap
FROM base b
LEFT JOIN ne ON ne.c_mktsegment = b.c_mktsegment
LEFT JOIN ni ON ni.c_mktsegment = b.c_mktsegment
ORDER BY b.c_mktsegment
"""


@register(
    "anti_join_null_semantics",
    ops="J-anti,J-null-aware (NOT IN vs NOT EXISTS with NULLs)",
    doc="The NOT IN null trap, pinned: the subquery key list carries "
    "injected NULLs (1 in 97 orders), so ANSI three-valued logic makes "
    "`x NOT IN (list-with-NULL)` UNKNOWN for every row — NOT IN returns "
    "ZERO customers while NOT EXISTS (and Spark's left-anti join) "
    "returns the real dormant set. Spark plans the NOT IN as a "
    "null-aware anti join (NAAJ); the battery reports both counts per "
    "segment plus the trap flag, so a migration that 'simplifies' "
    "NOT EXISTS into NOT IN reds immediately. Identical SQL text runs "
    "on both engines.",
    oracle=_NIN_SQL,
)
def anti_join_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.sources.tables import load_tables

    load_tables(spark, sf_dir, ["orders", "customer"], register=True)
    return spark.sql(_NIN_SQL)
