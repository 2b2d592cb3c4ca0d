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


# log10(1 + 1/d) in parts-per-million — the public Benford first-digit
# expectation (rounded to the nearest ppm; a fixed literal in BOTH
# engines, so the comparison is exact).
_BENFORD_PPM = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
    6: 66947, 7: 57992, 8: 51153, 9: 45757,
}
_BENFORD_CASE = "CASE d " + " ".join(
    f"WHEN {d} THEN {p}" for d, p in _BENFORD_PPM.items()
) + " END"


@register(
    "benford_price_audit",
    ops="EXT-benford,A1,F1 (digit-distribution anomaly audit)",
    doc="Benford first-digit audit of o_totalprice — the classic "
    "fabricated-data / unit-mixing screen: observed first-digit shares "
    "in ppm vs the log10(1+1/d) expectation (fixed ppm literals, exact "
    "cross-engine), absolute deviation per digit, and the total "
    "variation distance in the final row set. One scan, one 9-group "
    "aggregate. (TPC-H prices are near-uniform, so the audit correctly "
    "reports a LARGE deviation — the signal a screen exists to raise.)",
    oracle=f"""
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
              AS INT) AS d
  FROM orders WHERE o_totalprice >= 1
),
counts AS (
  SELECT d, CAST(COUNT(1) AS BIGINT) AS n FROM digits GROUP BY d
),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM counts)
SELECT c.d AS first_digit, c.n,
       (c.n * 1000000) // t.total AS observed_ppm,
       {_BENFORD_CASE.replace('CASE d', 'CASE c.d')} AS benford_ppm,
       abs((c.n * 1000000) // t.total - {_BENFORD_CASE.replace('CASE d', 'CASE c.d')})
         AS deviation_ppm
FROM counts c, tot t
""",
)
def benford_price_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    digits = orders.filter(F.col("o_totalprice") >= 1).select(
        F.substring(
            F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
        )
        .cast("int")
        .alias("d")
    )
    counts = digits.groupBy("d").agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(F.sum("n").alias("total"))
    benford = F.expr(_BENFORD_CASE)
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            F.col("d").alias("first_digit"),
            "n",
            F.expr("(n * 1000000) div total").alias("observed_ppm"),
            benford.alias("benford_ppm"),
            F.abs(F.expr("(n * 1000000) div total") - benford).alias(
                "deviation_ppm"
            ),
        )
    )


@register(
    "quality_vs_duplication",
    ops="EXT-quality-dup-corr,A1,W1 (curation-signal cross-tabulation)",
    doc="Do duplicates skew low-quality? Quality-score quintiles "
    "(ntile(5) over the (score, doc_id) total order) cross-tabulated "
    "with exact-dup membership (doc's fingerprint group has >1 copy): "
    "per quintile, docs, duplicate docs, dup-rate ppm. The evidence "
    "behind ordering dedup before/after quality gates in a curation "
    "funnel. One scan feeds both signals; windows run over doc-level "
    "relations.",
    oracle="""
WITH q AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '\\b(the|and|of|to|a|in|is)\\b'))
           / len(regexp_split_to_array(trim(text), '\\s+')) * 0.4
         + least(len(regexp_split_to_array(trim(text), '\\s+')) / 100.0, 1.0) * 0.3
         + (1.0 - (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
                / length(text)) * 0.3 AS score,
         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
  FROM documents
),
dupes AS (
  SELECT fp, COUNT(1) > 1 AS is_dup_group FROM q GROUP BY fp
),
tiled AS (
  SELECT q.doc_id, d.is_dup_group,
         CAST(NTILE(5) OVER (ORDER BY q.score ASC, q.doc_id ASC) AS INT)
           AS quintile
  FROM q JOIN dupes d ON d.fp = q.fp
)
SELECT quintile,
       CAST(COUNT(1) AS BIGINT) AS n_docs,
       CAST(COUNT(1) FILTER (WHERE is_dup_group) AS BIGINT) AS n_dup_docs,
       (COUNT(1) FILTER (WHERE is_dup_group) * 1000000) // COUNT(1)
         AS dup_rate_ppm
FROM tiled
GROUP BY quintile
""",
)
def quality_vs_duplication(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.functions.text import fingerprint, quality_score
    from formula_1_spark.operators.windows import global_ntile_two_phase

    docs = load_table(spark, sf_dir, "documents")
    q = docs.select(
        "doc_id",
        quality_score("text").alias("score"),
        fingerprint("text").alias("fp"),
    )
    dupes = q.groupBy("fp").agg((F.count(F.lit(1)) > 1).alias("is_dup_group"))
    # Two-phase exact NTILE(5) over (score, doc_id) — parallel batch
    # assignment instead of a single-partition corpus sort.
    tiled = global_ntile_two_phase(
        q.join(dupes, "fp").select("doc_id", "is_dup_group", "score"),
        [F.asc("score"), F.asc("doc_id")],
        5,
        alias="quintile",
    )
    return tiled.groupBy("quintile").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_if("is_dup_group").alias("n_dup_docs"),
        F.expr("(count_if(is_dup_group) * 1000000) div count(1)").alias(
            "dup_rate_ppm"
        ),
    )
