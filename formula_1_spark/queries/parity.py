"""Reference-parity queries (SURVEY.md §2) over the driver testdata.

Each query re-expresses one or more reference operator shapes
(``Transform Silver Data.py`` / ``Data Visualization.sql``) against the
TPC-H-ish star schema, with a matching DuckDB oracle. Role mapping
(FIXTURES.md §A): lineitem→results-like fact, orders→races/schedule,
customer/supplier/part→driver/constructor/circuit dims, nation+region→
snowflaked dims, events→lap/pitstop stream analog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from formula_1_spark.operators.aggregates import conditional_count_agg, having, pre_aggregate
from formula_1_spark.operators.joins import compound_key_join, dim_join
from formula_1_spark.operators.windows import (
    rank_standings,
    two_phase_global_topk,
)
from formula_1_spark.queries.registry import register
from formula_1_spark.sources.tables import load_table, load_tables


# ---------------------------------------------------------------------------
# 1. raceResults denormalization: pre-agg + 4-way join + qualified projection
#    Reference: Transform Silver Data.py:92-124 (A1, J1-J4, P5, P6, P8) with
#    the deliberate lossy-inner-join quirk (SURVEY §2.12 #3): the pre-agg is
#    computed over a filtered subset (shipments >= 1998, mirroring
#    "pitstops exist only >= 2012"), and the INNER join drops fact rows
#    without a match.
# ---------------------------------------------------------------------------
@register(
    "race_results_denorm",
    ops="S6,A1,J1,J2,J3,J4,P5,P6,P8",
    doc="Pre-aggregate + broadcast dim joins + compound-key inner join "
    "(Transform Silver Data.py:92-124); lossy-join parity quirk #3.",
    oracle="""
WITH preagg AS (
  SELECT l_orderkey, l_suppkey,
         MAX(l_linenumber) AS max_line_no,
         COUNT(*) AS n_recent_lines
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1998-01-01'
  GROUP BY l_orderkey, l_suppkey
)
SELECT l.l_orderkey, l.l_linenumber, l.l_quantity, l.l_extendedprice,
       p.p_name, p.p_brand, s.s_name,
       CAST(year(o.o_orderdate) AS INTEGER) AS order_year,
       o.o_totalprice,
       pa.max_line_no, pa.n_recent_lines
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN preagg pa
  ON l.l_orderkey = pa.l_orderkey AND l.l_suppkey = pa.l_suppkey
""",
)
def race_results_denorm(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")

    # A1: manual pre-aggregation before the join — shrinks the probe side
    # once instead of joining raw rows (Catalyst won't do this for us).
    preagg = pre_aggregate(
        li.filter(F.col("l_shipdate") >= "1998-01-01"),
        ["l_orderkey", "l_suppkey"],
        {
            "max_line_no": F.max("l_linenumber"),
            "n_recent_lines": F.count(F.lit(1)),
        },
    )

    # J1-J3: dimension lookups stay map-side via broadcast.
    fact = dim_join(li, orders, li.l_orderkey == orders.o_orderkey)
    fact = dim_join(fact, part, fact.l_partkey == part.p_partkey)
    fact = dim_join(fact, supplier, fact.l_suppkey == supplier.s_suppkey)

    # J4: compound-key INNER join to the aggregate (lossy on purpose).
    joined = compound_key_join(fact, preagg, ["l_orderkey", "l_suppkey"], how="inner")

    # P5/P6: qualified projection + derived year.
    return joined.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "p_name",
        "p_brand",
        "s_name",
        F.year("o_orderdate").alias("order_year"),
        "o_totalprice",
        "max_line_no",
        "n_recent_lines",
    )


# ---------------------------------------------------------------------------
# 2. Driver standings: conditional-count agg + per-season competition rank
#    Reference: Transform Silver Data.py:128-139 (A3, W1, P6, F5, F9, F10).
#    total_points sums l_quantity (integral doubles → exact, so the rank
#    order is engine-deterministic).
# ---------------------------------------------------------------------------
@register(
    "driver_standings",
    ops="A3,W1,P6,F5,F9,F10,J1,J2",
    doc="Season standings: sum(points) + count(when(win)) + rank() over "
    "partitionBy(season).orderBy(desc) — Transform Silver Data.py:128-139.",
    oracle="""
WITH standings AS (
  SELECT CAST(year(o.o_orderdate) AS INTEGER) AS season,
         c.c_custkey, c.c_name,
         SUM(l.l_quantity) AS total_points,
         COUNT(CASE WHEN l.l_returnflag = 'R' THEN 1 END) AS wins
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2, 3
)
SELECT season, c_custkey, c_name, total_points, wins,
       CAST(RANK() OVER (
         PARTITION BY season
         ORDER BY total_points DESC, wins DESC) AS INTEGER) AS rank
FROM standings
""",
)
def driver_standings(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")

    base = dim_join(li, orders, li.l_orderkey == orders.o_orderkey)
    base = dim_join(base, customer, base.o_custkey == customer.c_custkey)
    base = base.withColumn("season", F.year("o_orderdate"))

    standings = conditional_count_agg(
        base,
        ["season", "c_custkey", "c_name"],
        sum_col="l_quantity",
        sum_alias="total_points",
        win_cond=F.col("l_returnflag") == "R",
        win_alias="wins",
    )
    return rank_standings(
        standings, ["season"], [F.desc("total_points"), F.desc("wins")], alias="rank"
    )


# ---------------------------------------------------------------------------
# 3. Constructor standings: same shape, coarser grouping key (A4, W1) via
#    the snowflaked supplier→nation dim chain.
#    Reference: Transform Silver Data.py:143-154.
# ---------------------------------------------------------------------------
@register(
    "constructor_standings",
    ops="A4,W1,J1,J3",
    doc="Coarser-key standings (nation level) — Transform Silver "
    "Data.py:143-154; snowflake dim chain supplier→nation.",
    oracle="""
WITH standings AS (
  SELECT CAST(year(o.o_orderdate) AS INTEGER) AS season,
         n.n_name,
         SUM(l.l_quantity) AS total_points,
         COUNT(CASE WHEN l.l_returnflag = 'R' THEN 1 END) AS wins
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  GROUP BY 1, 2
)
SELECT season, n_name, total_points, wins,
       CAST(RANK() OVER (
         PARTITION BY season
         ORDER BY total_points DESC, wins DESC) AS INTEGER) AS rank
FROM standings
""",
)
def constructor_standings(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    base = dim_join(li, orders, li.l_orderkey == orders.o_orderkey)
    base = dim_join(base, supplier, base.l_suppkey == supplier.s_suppkey)
    base = dim_join(base, nation, base.s_nationkey == nation.n_nationkey)
    base = base.withColumn("season", F.year("o_orderdate"))

    standings = conditional_count_agg(
        base,
        ["season", "n_name"],
        sum_col="l_quantity",
        sum_alias="total_points",
        win_cond=F.col("l_returnflag") == "R",
        win_alias="wins",
    )
    return rank_standings(
        standings, ["season"], [F.desc("total_points"), F.desc("wins")], alias="rank"
    )


# ---------------------------------------------------------------------------
# 4. Adjusted-points report via the SQL surface: group-agg + HAVING + sort.
#    Reference: Data Visualization.sql:45-94 (A5, A6, O1, P6, P7, F8).
#    Runs through spark.sql over temp views — exercises the SQL half of the
#    engine (same Catalyst pipeline as the DataFrame half).
# ---------------------------------------------------------------------------
@register(
    "adjusted_points_report",
    ops="A5,A6,O1,O2,P6,P7,F8,S-sql",
    doc="COUNT/SUM/AVG of (11 - position) with HAVING + multi-key ORDER BY "
    "— Data Visualization.sql:45-94, via spark.sql.",
    oracle="""
SELECT c.c_name,
       CAST(year(o.o_orderdate) AS INTEGER) AS season,
       COUNT(1) AS races,
       CAST(SUM(11 - l.l_linenumber) AS BIGINT) AS total_adjusted_points,
       AVG(11 - l.l_linenumber) AS avg_adjusted_points
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE l.l_linenumber <= 10
GROUP BY c.c_name, CAST(year(o.o_orderdate) AS INTEGER)
HAVING COUNT(1) >= 5
ORDER BY season, avg_adjusted_points DESC, total_adjusted_points DESC
""",
)
def adjusted_points_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ["lineitem", "orders", "customer"], register=True)
    return spark.sql(
        """
        SELECT c.c_name,
               YEAR(o.o_orderdate) AS season,
               COUNT(1) AS races,
               SUM(11 - l.l_linenumber) AS total_adjusted_points,
               AVG(11 - l.l_linenumber) AS avg_adjusted_points
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE l.l_linenumber <= 10
        GROUP BY c.c_name, YEAR(o.o_orderdate)
        HAVING COUNT(1) >= 5
        ORDER BY season, avg_adjusted_points DESC, total_adjusted_points DESC
        """
    )


# ---------------------------------------------------------------------------
# 5. Dominant-customers top-k: global rank over aggregate + join back +
#    rank filter. Reference: Data Visualization.sql:98-131 (W2, J6, O3, A6).
# ---------------------------------------------------------------------------
@register(
    "dominant_customers_topk",
    ops="W2,J6,O3,A5,A6",
    doc="CTE: global RANK() OVER (ORDER BY avg DESC) on an aggregate, join "
    "back to per-season detail, filter rank <= 15 — Data "
    "Visualization.sql:98-131.",
    oracle="""
WITH base AS (
  SELECT c.c_name,
         CAST(year(o.o_orderdate) AS INTEGER) AS season,
         11 - l.l_linenumber AS adj
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
),
per_season AS (
  SELECT c_name, season,
         CAST(COUNT(1) AS BIGINT) AS races,
         CAST(SUM(adj) AS BIGINT) AS total_adjusted_points,
         AVG(adj) AS avg_adjusted_points
  FROM base GROUP BY c_name, season
),
overall AS (
  SELECT c_name, AVG(adj) AS overall_avg
  FROM base GROUP BY c_name HAVING COUNT(1) >= 20
),
ranked AS (
  SELECT c_name, overall_avg,
         CAST(RANK() OVER (ORDER BY overall_avg DESC) AS INTEGER) AS cust_rank
  FROM overall
)
SELECT ps.c_name, ps.season, ps.races, ps.total_adjusted_points,
       ps.avg_adjusted_points, r.cust_rank
FROM per_season ps
JOIN ranked r ON ps.c_name = r.c_name
WHERE r.cust_rank <= 15
""",
)
def dominant_customers_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")

    base = dim_join(li, orders, li.l_orderkey == orders.o_orderkey)
    base = dim_join(base, customer, base.o_custkey == customer.c_custkey)
    base = base.select(
        "c_name",
        F.year("o_orderdate").alias("season"),
        (F.lit(11) - F.col("l_linenumber")).alias("adj"),
    )

    per_season = base.groupBy("c_name", "season").agg(
        F.count(F.lit(1)).alias("races"),
        F.sum("adj").alias("total_adjusted_points"),
        F.avg("adj").alias("avg_adjusted_points"),
    )
    overall = having(
        base.groupBy("c_name").agg(
            F.avg("adj").alias("overall_avg"), F.count(F.lit(1)).alias("n")
        ),
        F.col("n") >= 20,
    ).drop("n")
    # W2 shape, executed scale-safe: the rollup is CUSTOMER-grain (one
    # row per customer — still fact-scale at 100 TB), so the global rank
    # runs as the two-phase prune; competition-rank semantics (ties
    # share a rank) are preserved exactly, so the result matches the
    # reference's unpartitioned-rank form bit for bit.
    ranked = two_phase_global_topk(
        overall, [F.desc("overall_avg")], 15, alias="cust_rank"
    )

    # J6 + O3: join detail back to the ranked aggregate, top-k filter.
    return (
        dim_join(per_season, ranked.filter(F.col("cust_rank") <= 15), on="c_name")
        .select(
            "c_name",
            "season",
            "races",
            "total_adjusted_points",
            "avg_adjusted_points",
            "cust_rank",
        )
    )


# ---------------------------------------------------------------------------
# 6. JSON extraction from a string column — the flattener's row-level analog
#    (P3; bronze JSON → typed columns, Clean Bronze Data.py:53-102) applied
#    to the events.props JSON string.
# ---------------------------------------------------------------------------
@register(
    "events_json_extract",
    ops="P3,F-json,P6",
    doc="Parse a JSON string column into typed fields (bronze→silver "
    "flattening analog, Clean Bronze Data.py:53-102).",
    oracle="""
SELECT event_id, event_type,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
       value
FROM events
""",
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("int").alias("k_val"),
        "value",
    )


# ---------------------------------------------------------------------------
# 7. Scalar function battery: regexp_replace / concat / to_timestamp /
#    year / floor / arithmetic (F1-F8, Clean Bronze Data.py:132-143,
#    Data Visualization.sql:23-28).
# ---------------------------------------------------------------------------
@register(
    "scalar_functions",
    ops="F1,F2,F3,F5,F6,F7,F8,P6",
    doc="regexp_replace + concat + to_timestamp round-trip + year + floor "
    "+ arithmetic — Clean Bronze Data.py:132-143 battery.",
    oracle="""
SELECT o_orderkey,
       regexp_replace(o_orderpriority, '^[0-9]-', '') AS priority_label,
       o_orderstatus || '_' || regexp_replace(o_orderpriority, '^[0-9]-', '')
         AS status_priority,
       strftime(strptime(strftime(o_orderdate, '%Y-%m-%d') || ' 12:00:00',
                         '%Y-%m-%d %H:%M:%S'),
                '%Y-%m-%d %H:%M:%S') AS order_noon_ts,
       CAST(year(o_orderdate) AS INTEGER) AS order_year,
       CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
       o_totalprice * 0.5 + 10.0 AS adjusted_price
FROM orders
""",
)
def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    priority_label = F.regexp_replace("o_orderpriority", "^[0-9]-", "")
    return orders.select(
        "o_orderkey",
        priority_label.alias("priority_label"),
        F.concat("o_orderstatus", F.lit("_"), priority_label).alias("status_priority"),
        F.date_format(
            F.to_timestamp(
                F.concat(F.date_format("o_orderdate", "yyyy-MM-dd"), F.lit(" 12:00:00")),
                "yyyy-MM-dd HH:mm:ss",
            ),
            "yyyy-MM-dd HH:mm:ss",
        ).alias("order_noon_ts"),
        F.year("o_orderdate").alias("order_year"),
        F.floor("o_totalprice").alias("price_floor"),
        (F.col("o_totalprice") * 0.5 + 10.0).alias("adjusted_price"),
    )


# ---------------------------------------------------------------------------
# 8. Filtered projection — predicate + column pruning pushed to the parquet
#    scan (P7, P8, S6; Data Visualization.sql:40-41). .explain shows
#    PushedFilters + a 4-column ReadSchema.
# ---------------------------------------------------------------------------
@register(
    "filter_scan_project",
    ops="P7,P8,S6,O1",
    doc="Filter + projection pushed into the parquet scan; multi-key sort.",
    oracle="""
SELECT l_orderkey, l_linenumber, l_extendedprice,
       strftime(l_shipdate, '%Y-%m-%d') AS ship_date
FROM lineitem
WHERE l_shipdate < TIMESTAMP '1997-01-01' AND l_discount > 0.05
ORDER BY l_orderkey, l_linenumber
""",
)
def filter_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_shipdate") < "1997-01-01") & (F.col("l_discount") > 0.05))
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_extendedprice",
            F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_date"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


# ---------------------------------------------------------------------------
# 9. Set operations (SURVEY §2.7: absent in the reference, native in the
#    engine): INTERSECT + EXCEPT on distinct key sets.
# ---------------------------------------------------------------------------
@register(
    "customer_retention_setops",
    ops="SET-union,SET-intersect,SET-except,P6,P7",
    doc="Customers ordering in both 1997 and 1998 but not 1999 — "
    "INTERSECT/EXCEPT distinct semantics.",
    oracle="""
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
INTERSECT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1998
EXCEPT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1999
""",
)
def customer_retention_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")

    def keys(year: int) -> DataFrame:
        return orders.filter(F.year("o_orderdate") == year).select("o_custkey")

    return keys(1997).intersect(keys(1998)).subtract(keys(1999))
