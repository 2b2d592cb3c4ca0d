"""Scalar-function breadth: rollup subtotals, typed from_json, string
battery, date arithmetic — each mirrored in the DuckDB oracle (including
the cross-engine quirks: dayofweek base, date_diff argument order)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from formula_1_spark.queries.registry import register
from formula_1_spark.sources.tables import load_table


@register(
    "lineitem_rollup",
    ops="EXT-rollup,A5",
    doc="ROLLUP hierarchy subtotals (flag → flag+status → grand total).",
    oracle="""
SELECT l_returnflag, l_linestatus,
       COUNT(1) AS n_rows,
       SUM(l_quantity) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def lineitem_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum("l_quantity").alias("sum_qty")
    )


@register(
    "events_from_json_typed",
    ops="P3,F-json",
    doc="Typed JSON parsing via from_json with an explicit schema (the "
    "declared-schema sibling of events_json_extract).",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
       CAST(json_extract_string(props, '$.k') AS INTEGER) * 2 AS k_doubled
FROM events
""",
)
def events_from_json_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.select(
        "event_id", F.from_json("props", "k INT").alias("p")
    )
    return parsed.select(
        "event_id",
        F.col("p.k").alias("k_val"),
        (F.col("p.k") * 2).alias("k_doubled"),
    )


@register(
    "string_functions_battery",
    ops="F7,EXT-strings",
    doc="upper/lower/substr/lpad/translate/replace/trim/strpos/split_part "
    "over part names.",
    oracle="""
SELECT p_partkey,
       upper(p_name) AS name_upper,
       lower(p_brand) AS brand_lower,
       substr(p_name, 1, 5) AS name_prefix,
       lpad(p_brand, 12, '.') AS brand_padded,
       translate(p_type, 'AEIOU', 'aeiou') AS type_translated,
       replace(p_name, ' ', '_') AS name_snake,
       trim(p_name) AS name_trim,
       CAST(strpos(p_name, 'a') AS INTEGER) AS first_a,
       split_part(p_type, ' ', 1) AS type_head,
       CAST(length(p_name) AS INTEGER) AS name_len
FROM part
""",
)
def string_functions_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.lpad("p_brand", 12, ".").alias("brand_padded"),
        F.translate("p_type", "AEIOU", "aeiou").alias("type_translated"),
        F.replace("p_name", F.lit(" "), F.lit("_")).alias("name_snake"),
        F.trim("p_name").alias("name_trim"),
        F.instr("p_name", "a").alias("first_a"),
        F.split_part("p_type", F.lit(" "), F.lit(1)).alias("type_head"),
        F.length("p_name").alias("name_len"),
    )


@register(
    "date_arithmetic_battery",
    ops="F5,EXT-dates",
    doc="datediff / date_add / last_day / month-trunc / dayofweek (Spark "
    "Sunday=1 vs DuckDB Sunday=0 reconciled) over orders.",
    oracle="""
SELECT o_orderkey,
       CAST(date_diff('day', o_orderdate, TIMESTAMP '2004-01-01') AS INTEGER)
         AS days_to_2004,
       strftime(o_orderdate + INTERVAL '90 days', '%Y-%m-%d') AS plus_90d,
       strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
       CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow_sunday1,
       CAST(quarter(o_orderdate) AS INTEGER) AS qtr
FROM orders
""",
)
def date_arithmetic_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.datediff(F.lit("2004-01-01").cast("date"), d).alias("days_to_2004"),
        F.date_format(F.date_add(d, 90), "yyyy-MM-dd").alias("plus_90d"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.trunc(d, "month"), "yyyy-MM-dd").alias("month_start"),
        F.dayofweek(d).alias("dow_sunday1"),
        F.quarter(d).alias("qtr"),
    )


# ---------------------------------------------------------------------------
# NULL-semantics battery (round 10)
# ---------------------------------------------------------------------------


@register(
    "null_semantics_battery",
    ops="EXT-null-semantics,F-battery,W1 (cross-engine NULL parity)",
    doc="NULL-semantics parity battery: synthesize NULLs into a segment "
    "key (NULLIF) and a measure (1-in-7 rows), then exercise every "
    "NULL rule a migration must preserve — COUNT(*) vs COUNT(col), "
    "SUM ignoring NULLs (and returning NULL for all-NULL groups, kept "
    "visible via COALESCE), null-safe equality (Spark <=> == DuckDB "
    "IS NOT DISTINCT FROM), GROUP BY collecting NULL keys into one "
    "group, and RANK with an EXPLICIT NULLS LAST (Spark ASC defaults "
    "NULLS FIRST while DuckDB defaults NULLS LAST — the battery pins "
    "the ordering so both engines agree; the rank window partitions on "
    "(segment, nation), dim-bounded keys).",
    oracle="""
WITH base AS (
  SELECT c_custkey, c_nationkey,
         NULLIF(c_mktsegment, 'MACHINERY') AS seg,
         CASE WHEN c_custkey % 7 = 0 THEN NULL
              ELSE CAST(FLOOR(c_acctbal * 100) AS BIGINT) END AS bal_cents
  FROM customer
),
ranked AS (
  SELECT *, CAST(RANK() OVER (PARTITION BY seg, c_nationkey
                 ORDER BY bal_cents ASC NULLS LAST, c_custkey ASC)
                 AS BIGINT) AS rk
  FROM base
)
SELECT COALESCE(seg, '<null-group>') AS seg_key,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(bal_cents) AS BIGINT) AS n_nonnull,
       CAST(COUNT(*) - COUNT(bal_cents) AS BIGINT) AS n_null,
       CAST(COALESCE(SUM(bal_cents), 0) AS BIGINT) AS sum_cents,
       CAST(SUM(CASE WHEN bal_cents IS NOT DISTINCT FROM NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS null_safe_nulls,
       CAST(MAX(CASE WHEN bal_cents IS NULL THEN rk END) AS BIGINT)
         AS max_null_rank,
       CAST(MIN(rk) AS BIGINT) AS min_rank
FROM ranked
GROUP BY seg
ORDER BY seg_key
""",
)
def null_semantics_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    cust = load_table(spark, sf_dir, "customer")
    base = cust.select(
        "c_custkey",
        "c_nationkey",
        F.expr("NULLIF(c_mktsegment, 'MACHINERY')").alias("seg"),
        F.expr(
            "CASE WHEN c_custkey % 7 = 0 THEN NULL"
            " ELSE CAST(FLOOR(c_acctbal * 100) AS BIGINT) END"
        ).alias("bal_cents"),
    )
    w = Window.partitionBy("seg", "c_nationkey").orderBy(
        F.asc_nulls_last("bal_cents"), F.asc("c_custkey")
    )
    ranked = base.withColumn("rk", F.rank().over(w).cast("bigint"))
    return (
        ranked.groupBy("seg")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.count("bal_cents").cast("bigint").alias("n_nonnull"),
            (F.count(F.lit(1)) - F.count("bal_cents"))
            .cast("bigint")
            .alias("n_null"),
            F.coalesce(F.sum("bal_cents"), F.lit(0))
            .cast("bigint")
            .alias("sum_cents"),
            F.sum(
                F.when(F.expr("bal_cents <=> NULL"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("null_safe_nulls"),
            F.max(F.when(F.col("bal_cents").isNull(), F.col("rk")))
            .cast("bigint")
            .alias("max_null_rank"),
            F.min("rk").cast("bigint").alias("min_rank"),
        )
        .select(
            F.coalesce("seg", F.lit("<null-group>")).alias("seg_key"),
            "n_rows",
            "n_nonnull",
            "n_null",
            "sum_cents",
            "null_safe_nulls",
            "max_null_rank",
            "min_rank",
        )
        .orderBy("seg_key")
    )


# ---------------------------------------------------------------------------
# try_* ANSI-safety battery (round 10)
# ---------------------------------------------------------------------------

_I64_MAX = 9_223_372_036_854_775_807


@register(
    "try_functions_battery",
    ops="EXT-try-functions,F-battery (ANSI-safe arithmetic parity)",
    doc="ANSI-safety battery for the try_* family: try_cast over a "
    "mixed-quality string column (1/3 valid integer cents, 1/3 garbage, "
    "1/3 empty — strings built from exact integers so the round-trip "
    "never depends on float formatting), try_divide with a cycling "
    "divisor that hits zero, and try_add driven to bigint overflow on a "
    "near-MAX operand. Spark's try_* return NULL where strict ANSI "
    "would raise; the oracle replays each as TRY_CAST / explicit CASE "
    "guards (DuckDB ERRORS on bigint overflow rather than NULLing, so "
    "the guard is the semantics being pinned). Per-priority counts of "
    "each NULL class plus the exact surviving sum.",
    oracle=f"""
WITH base AS (
  SELECT o_orderpriority AS pri,
         CASE WHEN o_orderkey % 3 = 0
              THEN CAST(CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS VARCHAR)
              WHEN o_orderkey % 3 = 1 THEN 'not-a-number'
              ELSE '' END AS str_val,
         CAST(o_orderkey % 10 AS BIGINT) AS div_q,
         CAST({_I64_MAX} - (o_orderkey % 1000) AS BIGINT) AS near_max,
         CAST(o_orderkey % 7 AS BIGINT) AS inc
  FROM orders
),
evaled AS (
  SELECT pri,
         TRY_CAST(str_val AS BIGINT) AS cast_cents,
         CASE WHEN div_q = 0 THEN NULL
              ELSE CAST(100 AS DOUBLE) / div_q END AS div_val,
         CASE WHEN inc > (o.mx - near_max) THEN NULL
              ELSE near_max + inc END AS add_val
  FROM base, (SELECT CAST({_I64_MAX} AS BIGINT) AS mx) o
)
SELECT pri AS o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) - COUNT(cast_cents) AS BIGINT) AS n_cast_null,
       CAST(COALESCE(SUM(cast_cents), 0) AS BIGINT) AS sum_cast_cents,
       CAST(COUNT(*) - COUNT(div_val) AS BIGINT) AS n_div_null,
       CAST(COUNT(*) - COUNT(add_val) AS BIGINT) AS n_add_overflow
FROM evaled
GROUP BY pri
ORDER BY o_orderpriority
""",
)
def try_functions_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        F.col("o_orderpriority").alias("pri"),
        F.expr(
            "CASE WHEN o_orderkey % 3 = 0"
            " THEN CAST(CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS STRING)"
            " WHEN o_orderkey % 3 = 1 THEN 'not-a-number'"
            " ELSE '' END"
        ).alias("str_val"),
        (F.col("o_orderkey") % 10).cast("bigint").alias("div_q"),
        F.expr(f"CAST({_I64_MAX} - (o_orderkey % 1000) AS BIGINT)").alias(
            "near_max"
        ),
        (F.col("o_orderkey") % 7).cast("bigint").alias("inc"),
    )
    evaled = base.select(
        "pri",
        F.expr("try_cast(str_val AS BIGINT)").alias("cast_cents"),
        F.expr("try_divide(CAST(100 AS DOUBLE), div_q)").alias("div_val"),
        F.expr("try_add(near_max, inc)").alias("add_val"),
    )
    return (
        evaled.groupBy("pri")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            (F.count(F.lit(1)) - F.count("cast_cents"))
            .cast("bigint")
            .alias("n_cast_null"),
            F.coalesce(F.sum("cast_cents"), F.lit(0))
            .cast("bigint")
            .alias("sum_cast_cents"),
            (F.count(F.lit(1)) - F.count("div_val"))
            .cast("bigint")
            .alias("n_div_null"),
            (F.count(F.lit(1)) - F.count("add_val"))
            .cast("bigint")
            .alias("n_add_overflow"),
        )
        .select(
            F.col("pri").alias("o_orderpriority"),
            "n_rows",
            "n_cast_null",
            "sum_cast_cents",
            "n_div_null",
            "n_add_overflow",
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Ordered string aggregation: listagg / string_agg parity (round 10)
# ---------------------------------------------------------------------------

# Spark 4 `listagg(expr, sep) WITHIN GROUP (ORDER BY ...)` vs DuckDB
# `string_agg(expr, sep ORDER BY ...)` — same ANSI semantics, different
# spelling, so the battery pins them value-for-value: multi-key ordered
# concat, DISTINCT + WITHIN GROUP (order expr must equal the aggregated
# expr), and NULL skipping (both engines drop NULL elements without
# leaving separators). Aggregation grains are bounded — priority (5) x month
# (12) cells and a ~1/10000 keyed sample — so no group's string grows
# with the corpus (unbounded per-group concat is the anti-pattern this
# battery deliberately avoids at 100 TB).
_LISTAGG_SAMPLE_MOD = 9973


@register(
    "listagg_ordered_battery",
    ops="EXT-listagg,A5,F-battery (ordered string aggregation parity)",
    doc="Ordered string-aggregation battery: listagg/string_agg with "
    "multi-key ORDER BY (months by volume DESC, month ASC), DISTINCT "
    "WITHIN GROUP (status roster), and NULL-skipping (a ~1/10k keyed "
    "sample of order keys concatenated; NULL non-samples must vanish "
    "without separators). All grains domain-bounded: 5 priorities x 12 "
    "months; per-group strings never scale with the data.",
    oracle=f"""
WITH cells AS (
  SELECT o_orderpriority AS priority, month(o_orderdate) AS mo,
         CAST(COUNT(1) AS BIGINT) AS n
  FROM orders GROUP BY 1, 2
),
st AS (
  SELECT o_orderpriority AS priority,
         string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus)
           AS statuses,
         string_agg(CASE WHEN o_orderkey % {_LISTAGG_SAMPLE_MOD} = 0
                         THEN CAST(o_orderkey AS VARCHAR) END,
                    '|' ORDER BY o_orderkey) AS sampled_keys
  FROM orders GROUP BY 1
),
mo AS (
  SELECT priority,
         string_agg(CAST(mo AS VARCHAR), ',' ORDER BY n DESC, mo)
           AS months_by_volume,
         CAST(SUM(n) AS BIGINT) AS n_orders
  FROM cells GROUP BY priority
)
SELECT st.priority, st.statuses, st.sampled_keys,
       mo.months_by_volume, mo.n_orders
FROM st JOIN mo ON st.priority = mo.priority
ORDER BY st.priority
""",
)
def listagg_ordered_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.sources.tables import load_tables

    load_tables(spark, sf_dir, ["orders"], register=True)
    return spark.sql(f"""
WITH cells AS (
  SELECT o_orderpriority AS priority, month(o_orderdate) AS mo,
         CAST(COUNT(1) AS BIGINT) AS n
  FROM orders GROUP BY 1, 2
),
st AS (
  SELECT o_orderpriority AS priority,
         listagg(DISTINCT o_orderstatus, ',')
           WITHIN GROUP (ORDER BY o_orderstatus) AS statuses,
         listagg(CASE WHEN o_orderkey % {_LISTAGG_SAMPLE_MOD} = 0
                      THEN CAST(o_orderkey AS STRING) END, '|')
           WITHIN GROUP (ORDER BY o_orderkey) AS sampled_keys
  FROM orders GROUP BY 1
),
mo AS (
  SELECT priority,
         listagg(CAST(mo AS STRING), ',')
           WITHIN GROUP (ORDER BY n DESC, mo) AS months_by_volume,
         CAST(SUM(n) AS BIGINT) AS n_orders
  FROM cells GROUP BY priority
)
SELECT st.priority, st.statuses, st.sampled_keys,
       mo.months_by_volume, mo.n_orders
FROM st JOIN mo ON st.priority = mo.priority
ORDER BY st.priority
""")


# ---------------------------------------------------------------------------
# CUBE + grouping() disambiguation battery (round 10)
# ---------------------------------------------------------------------------

# orders_grouping_sets deliberately sidesteps grouping_id() with sentinel
# keys; this battery pins the OTHER half of the surface: CUBE expansion
# plus per-column grouping() flags over a grain key that CONTAINS real
# NULLs (NULLIF(l_linestatus,'O')), where a NULL cell is ambiguous —
# grouping()=0 means "the real NULL group", grouping()=1 means "subtotal
# over all statuses". Per-column grouping() is engine-portable (0/1 in
# both); grouping_id()'s bit order is not, so it stays out of the result.


@register(
    "cube_grouping_battery",
    ops="EXT-cube-grouping,A5 (CUBE + grouping() vs real NULL keys)",
    doc="CUBE(flag, nullable-status) with per-column grouping() flags: "
    "the derived status key holds REAL NULLs (NULLIF of the majority "
    "value), so every NULL cell in the output is ambiguous until the "
    "grouping() flag splits 'the real NULL group' (0) from 'subtotal "
    "over all' (1) — the classic rollup-report correctness trap. One "
    "Expand+Aggregate pass, domain-bounded output (4 grains x few "
    "values); quantities summed as exact BIGINTs.",
    oracle="""
SELECT l_returnflag AS flag, NULLIF(l_linestatus, 'O') AS status_n,
       CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
       CAST(GROUPING(NULLIF(l_linestatus, 'O')) AS INT) AS g_status,
       CAST(COUNT(1) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem
GROUP BY CUBE(l_returnflag, NULLIF(l_linestatus, 'O'))
""",
)
def cube_grouping_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.sources.tables import load_tables

    load_tables(spark, sf_dir, ["lineitem"], register=True)
    return spark.sql("""
SELECT l_returnflag AS flag, NULLIF(l_linestatus, 'O') AS status_n,
       CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
       CAST(GROUPING(NULLIF(l_linestatus, 'O')) AS INT) AS g_status,
       CAST(COUNT(1) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem
GROUP BY CUBE(l_returnflag, NULLIF(l_linestatus, 'O'))
""")


@register(
    "rollup_distinct_count_battery",
    ops="EXT-rollup-distinct,A5 (non-reaggregable DISTINCT under ROLLUP)",
    doc="COUNT(DISTINCT custkey) at every ROLLUP(priority, year) grain "
    "in one statement — the trap this pins is that distinct counts are "
    "NOT reaggregable (summing per-year distinct customers overcounts "
    "the priority total), so the engine must Expand the input once per "
    "grain and run true distinct aggregation per grain; any shortcut "
    "that rolls the finer grain up hash-mismatches. grouping() flags "
    "disambiguate subtotal rows. Output is grain-bounded (priorities x "
    "years + margins).",
    oracle="""
SELECT o_orderpriority AS priority,
       CAST(year(o_orderdate) AS INT) AS yr,
       CAST(GROUPING(o_orderpriority) AS INT) AS g_pri,
       CAST(GROUPING(year(o_orderdate)) AS INT) AS g_yr,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
       CAST(COUNT(1) AS BIGINT) AS n_orders
FROM orders
GROUP BY ROLLUP(o_orderpriority, year(o_orderdate))
""",
)
def rollup_distinct_count_battery(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from formula_1_spark.sources.tables import load_tables

    load_tables(spark, sf_dir, ["orders"], register=True)
    return spark.sql("""
SELECT o_orderpriority AS priority,
       CAST(year(o_orderdate) AS INT) AS yr,
       CAST(GROUPING(o_orderpriority) AS INT) AS g_pri,
       CAST(GROUPING(year(o_orderdate)) AS INT) AS g_yr,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
       CAST(COUNT(1) AS BIGINT) AS n_orders
FROM orders
GROUP BY ROLLUP(o_orderpriority, year(o_orderdate))
""")
