"""Data-quality expectations, weighted (priority) sampling, and GROUPING
SETS — pipeline-governance surface with full DuckDB oracles.

Reference scope note: the reference (uwe-uffuchs/formula-1) has no
quality gate — malformed rows flow into silver unchecked (SURVEY.md §2.12
quirks). These queries are the engine's extension surface for curation
pipelines that must quantify and quarantine bad rows at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from formula_1_spark.operators.quality import DROP, WARN, Expectation, expectation_stats
from formula_1_spark.queries.registry import register
from formula_1_spark.sources.tables import load_table, load_tables

# One shared rule set: the Spark side builds Column predicates, the oracle
# repeats each predicate verbatim in SQL (NULL-safe via coalesce, matching
# operators.quality semantics: NULL predicate == violation).
_RULES_SQL = [
    ("qty_positive", DROP, "l_quantity >= 1"),
    ("qty_le_45", WARN, "l_quantity <= 45"),
    ("price_positive", DROP, "l_extendedprice > 0"),
    ("discount_le_8pct", WARN, "l_discount <= 0.08"),
    ("tax_le_6pct", WARN, "l_tax <= 0.06"),
    ("flag_known", DROP, "l_returnflag IN ('A', 'N', 'R')"),
]

_STATS_AGG = ",\n".join(
    f"    SUM(CASE WHEN NOT coalesce({sql}, FALSE) THEN 1 ELSE 0 END)::BIGINT AS v{i}"
    for i, (_, _, sql) in enumerate(_RULES_SQL)
)
_STATS_ROWS = "\nUNION ALL\n".join(
    f"SELECT '{name}' AS rule_name, '{action}' AS action, n AS n_rows, "
    f"v{i} AS n_violations, (v{i} * 1000000) // n AS violation_ppm FROM a"
    for i, (name, action, _) in enumerate(_RULES_SQL)
)


def lineitem_expectations() -> list[Expectation]:
    return [
        Expectation(name, F.expr(sql), action) for name, action, sql in _RULES_SQL
    ]


@register(
    "data_quality_expectations",
    ops="EXT-quality-expectations,A3,P7 (declarative row constraints, one-pass stats)",
    doc="DLT-style expectations over lineitem: six named rules (drop/warn "
    "actions) evaluated as conditional sums in ONE aggregation pass (no "
    "per-rule scans), reported as exact integer-ppm violation rates. The "
    "enforce() split (clean/quarantine streams off the same scan) is "
    "pytest-covered; this query drives the stats surface.",
    oracle=f"""
WITH a AS (
  SELECT COUNT(1) AS n,
{_STATS_AGG}
  FROM lineitem
)
{_STATS_ROWS}
""",
)
def data_quality_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return expectation_stats(li, lineitem_expectations())


@register(
    "sample_weighted_priority",
    ops="EXT-sampling-weighted,W2,O3 (priority sampling, two-phase top-k)",
    doc="Weighted sampling without replacement via priority sampling "
    "(Duffield-Lund-Thorup): priority = weight / hash-uniform(0,1], "
    "top-100 by priority two-phase (per-partition prune, no global "
    "sort), tau = 101st priority, est_weight = max(w, tau) the "
    "Horvitz-Thompson subset-sum estimator. All priorities are single "
    "IEEE divisions of exact integers — bit-identical cross-engine.",
    oracle="""
WITH pr AS (
  SELECT doc_id, n_chars,
         CAST(CAST(n_chars AS BIGINT) * 1000000 AS DOUBLE)
           / ((('0x' || substr(md5('prio' || ':' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
               % 1000000) + 1) AS priority
  FROM documents
),
rk AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY priority DESC, doc_id ASC) AS rk FROM pr
),
tau AS (SELECT MIN(CASE WHEN rk = 101 THEN priority END) AS tau FROM rk)
SELECT r.doc_id, r.n_chars, r.priority, CAST(r.rk AS INTEGER) AS rk,
       coalesce(t.tau, 0.0) AS tau,
       greatest(CAST(r.n_chars AS DOUBLE), coalesce(t.tau, 0.0)) AS est_weight
FROM rk r, tau t WHERE r.rk <= 100
""",
)
def sample_weighted_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.operators.sampling import priority_sample

    docs = load_table(spark, sf_dir, "documents")
    return priority_sample(docs, k=100, weight_col="n_chars").select(
        "doc_id", "n_chars", "priority", "rk", "tau", "est_weight"
    )


@register(
    "orders_grouping_sets",
    ops="A5,EXT-grouping-sets (multi-grain aggregate, one shuffle)",
    doc="GROUPING SETS ((priority), (year), ()) over orders in one pass — "
    "three aggregation grains from a single Expand+Aggregate (one "
    "shuffle), the relational sibling of cube/rollup. Null grain keys "
    "are coalesced to sentinels so the result is engine-portable without "
    "grouping_id().",
    oracle="""
SELECT COALESCE(o_orderpriority, 'ALL') AS priority_grp,
       COALESCE(o_year, -1) AS year_grp,
       COUNT(1) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM (
  SELECT o_orderpriority, CAST(year(o_orderdate) AS INTEGER) AS o_year, o_totalprice
  FROM orders
)
GROUP BY GROUPING SETS ((o_orderpriority), (o_year), ())
""",
)
def orders_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ["orders"], register=True)
    return spark.sql(
        """
        SELECT COALESCE(o_orderpriority, 'ALL') AS priority_grp,
               COALESCE(o_year, -1) AS year_grp,
               COUNT(1) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        FROM (
          SELECT o_orderpriority, CAST(year(o_orderdate) AS INT) AS o_year, o_totalprice
          FROM orders
        )
        GROUP BY GROUPING SETS ((o_orderpriority), (o_year), ())
        """
    )
