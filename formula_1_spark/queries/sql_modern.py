"""Modern SQL surface: recursive CTEs and correlated LATERAL subqueries
(both Spark 4 features), each with an exact DuckDB oracle.

Scale notes:

* The recursive CTE executes as an iterative chain of equi-joins (one per
  level — depth is log2(n) for the binary containment tree), each a plain
  hash join Catalyst optimizes like any other; no driver-side recursion.
  The recursion step joins on ``child DIV 2 = node`` — an EQUI join on an
  expression, never an IN/OR non-equi condition that would degrade to a
  nested-loop join.
* The LATERAL top-k decorrelates: Catalyst rewrites the per-row ORDER BY
  .. LIMIT subquery into a window rank over a single co-partitioned join —
  one shuffle on the correlation key, map-side WindowGroupLimit pruning.
  (Same physical shape as the two-phase top-k operator; this query proves
  the SQL-level spelling of it.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from formula_1_spark.queries.registry import register
from formula_1_spark.sources.tables import load_tables

_HIERARCHY_SQL = """
WITH RECURSIVE d(root, node, lvl) AS (
  SELECT p_partkey, p_partkey, 0 FROM part WHERE p_partkey BETWEEN 1 AND 7
  UNION ALL
  SELECT d.root, c.p_partkey, d.lvl + 1
  FROM d JOIN part c ON (c.p_partkey {div} 2) = d.node AND c.p_partkey > d.node
)
SELECT d.root,
       COUNT(1) AS subtree_size,
       CAST(MAX(d.lvl) AS INTEGER) AS depth,
       CAST(SUM(CAST(p.p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS subtree_price
FROM d JOIN part p ON p.p_partkey = d.node
GROUP BY d.root
"""


@register(
    "part_hierarchy_rollup",
    ops="EXT-recursive-cte,A1,J1 (iterative equi-join closure)",
    doc="Recursive CTE (WITH RECURSIVE, Spark 4): transitive closure of "
    "the binary part-containment tree (child keys 2k/2k+1) from 7 roots, "
    "rolled up to subtree size/depth/price. Each recursion level is one "
    "hash equi-join on child DIV 2 = node; depth = log2(|part|).",
    oracle=_HIERARCHY_SQL.format(div="//"),
)
def part_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ["part"], register=True)
    return spark.sql(_HIERARCHY_SQL.format(div="DIV"))


_LATERAL_SQL = """
SELECT c.c_custkey, l.o_orderkey, l.o_totalprice
FROM customer c,
LATERAL (
  SELECT o_orderkey, o_totalprice
  FROM orders o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey ASC
  LIMIT 3
) l
"""


@register(
    "lateral_top_orders",
    ops="EXT-lateral-join,O3,W1 (decorrelated per-key top-k)",
    doc="Correlated LATERAL subquery (Spark 4): top-3 orders by price per "
    "customer, deterministic orderkey tie-break. Catalyst decorrelates "
    "the per-row LIMIT into a windowed rank over one co-partitioned "
    "join — no per-customer re-execution.",
    oracle=_LATERAL_SQL,
)
def lateral_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ["customer", "orders"], register=True)
    return spark.sql(_LATERAL_SQL)


@register(
    "cogroup_order_reconciliation",
    ops="EXT-cogroup-arrow,UDF-pandas (two-sided Arrow kernel, bucketed key)",
    doc="Cogrouped applyInPandas E2E: orders and lineitem cogrouped on a "
    "64-way bucket key (one kernel call per bucket, NOT per order — "
    "per-group Python overhead amortizes across thousands of orders); "
    "the kernel folds each order's line terms sequentially in "
    "l_linenumber order, so the oracle replicates line_total bit-for-bit "
    "with an ordered list_reduce.",
    oracle="""
WITH lt AS (
  SELECT l_orderkey,
         list_reduce(
           list_prepend(0.0, list((l_extendedprice * (1.0 - l_discount)) * (1.0 + l_tax)
                                  ORDER BY l_linenumber)),
           (acc, v) -> acc + v) AS line_total,
         COUNT(1) AS n_lines
  FROM lineitem GROUP BY l_orderkey
)
SELECT o.o_orderkey, o.o_orderpriority, o.o_totalprice,
       COALESCE(lt.line_total, 0.0) AS line_total,
       COALESCE(lt.n_lines, 0) AS n_lines
FROM orders o LEFT JOIN lt ON lt.l_orderkey = o.o_orderkey
""",
)
def cogroup_order_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.operators.cogroup import order_reconciliation
    from formula_1_spark.sources.tables import load_table

    return order_reconciliation(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    )


@register(
    "events_variant_extract",
    ops="EXT-variant,P3,F-json (open-schema semi-structured type)",
    doc="Spark 4 VARIANT path over semi-structured props: parse_json into "
    "an open-schema VARIANT column, typed try_variant_get extraction with "
    "path misses as NULL — the schema-on-read alternative to the rigid "
    "from_json/StructType path (events_from_json_typed). VARIANT's binary "
    "encoding keeps extraction JVM-side and column-prunable; at 100 TB "
    "the parse happens once at ingest, extractions many times after.",
    oracle="""
SELECT event_id,
       CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
       CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket,
       CAST(json_extract(props, '$.missing') AS BIGINT) AS absent_val
FROM events
""",
)
def events_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from formula_1_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events")
    v = events.select("event_id", F.parse_json("props").alias("v"))
    return v.select(
        "event_id",
        F.try_variant_get("v", "$.k", "bigint").alias("k_val"),
        (F.try_variant_get("v", "$.k", "bigint") % 10).alias("k_bucket"),
        F.try_variant_get("v", "$.missing", "bigint").alias("absent_val"),
    )


# ---------------------------------------------------------------------------
# SQL pipe syntax (Spark 4) — round 6
# ---------------------------------------------------------------------------

# Spark 4 executes the |> pipe form natively; Catalyst plans it exactly
# like the ANSI equivalent (the oracle below) — same join reorder,
# pushdown and partial aggregation. The pipe spelling is registered to
# prove the modern-SQL surface through the driver gate, not as a new
# physical shape.
_PIPE_SQL = """
FROM lineitem
|> JOIN orders ON l_orderkey = o_orderkey
|> WHERE o_orderstatus = 'F'
|> EXTEND CAST(round(l_extendedprice * 100) AS BIGINT)
     * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_c4
|> AGGREGATE COUNT(*) AS n_lines, SUM(rev_c4) AS revenue_c4
   GROUP BY o_orderpriority
|> WHERE n_lines > 10
|> ORDER BY o_orderpriority
|> SELECT o_orderpriority, n_lines, revenue_c4
"""


@register(
    "orders_pipe_syntax_report",
    ops="EXT-sql-pipe,J1,A5,A6 (Spark 4 pipe-SQL surface)",
    doc="SQL pipe syntax (Spark 4 |> operators: JOIN, WHERE, EXTEND, "
    "AGGREGATE, post-agg WHERE as HAVING, ORDER BY, SELECT) through the "
    "driver gate. Integer-cents revenue (price x (100 - discount-pct) "
    "in c4 units) keeps the SUM order-independent. Oracle = the ANSI "
    "spelling, so the check proves the pipe form plans to identical "
    "values.",
    oracle="""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
         AS revenue_c4
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderstatus = 'F'
GROUP BY o_orderpriority
HAVING COUNT(*) > 10
ORDER BY o_orderpriority
""",
)
def orders_pipe_syntax_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ["lineitem", "orders"], register=True)
    return spark.sql(_PIPE_SQL)


# ---------------------------------------------------------------------------
# Collation-aware grouping (Spark 4) — round 6
# ---------------------------------------------------------------------------

# The testdata is uniformly cased, so the query first derives a
# mixed-case column deterministically (even keys lowercased) — the
# collation's case-insensitive equality then has real work to do: under
# UTF8_LCASE 'automobile' and 'AUTOMOBILE' group together WITHOUT a
# normalizing projection, which is the point of engine-level collations
# (comparisons, joins and aggregations pick up the semantics without
# rewriting every expression). Output is projected through lower() so
# the emitted representative is deterministic in both engines.
_COLLATED_SQL = """
WITH mixed AS (
  SELECT CASE WHEN c_custkey % 2 = 0 THEN lower(c_mktsegment)
              ELSE c_mktsegment END AS seg,
         c_acctbal
  FROM customer
)
SELECT lower(COLLATE(seg, 'UTF8_LCASE')) AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
         AS acctbal_cents
FROM mixed
GROUP BY COLLATE(seg, 'UTF8_LCASE')
ORDER BY segment
"""


@register(
    "segment_collated_rollup",
    ops="EXT-sql-collation,A5 (Spark 4 collation-aware grouping)",
    doc="Engine-level collation (Spark 4 COLLATE 'UTF8_LCASE') through "
    "the driver gate: a deterministically case-mixed market-segment "
    "column groups case-insensitively WITHOUT a normalizing projection "
    "in the GROUP BY — the aggregation itself carries the collation. "
    "Oracle spells the same semantics as lower()-grouping. Integer-"
    "cents balance sum keeps both engines bit-identical.",
    oracle="""
WITH mixed AS (
  SELECT CASE WHEN c_custkey % 2 = 0 THEN lower(c_mktsegment)
              ELSE c_mktsegment END AS seg,
         c_acctbal
  FROM customer
)
SELECT lower(seg) AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
         AS acctbal_cents
FROM mixed
GROUP BY lower(seg)
ORDER BY segment
""",
)
def segment_collated_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ["customer"], register=True)
    return spark.sql(_COLLATED_SQL)
