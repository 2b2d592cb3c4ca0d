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
