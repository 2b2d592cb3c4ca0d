"""MapType higher-order-function battery.

Completes the complex-type function surface (arrays/structs already
battery-covered) with the MapType HOFs: ``map_from_entries``,
``transform_values``, ``map_filter``, ``map_zip_with``, ``map_concat``,
``element_at``, ``map_keys``. The map is built deterministically — entries
sorted before ``map_from_entries`` — and every output is a SCALAR (the
driver canonicalizer can't hash map cells), so the oracle replicates the
semantics relationally without needing DuckDB map support.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from formula_1_spark.queries.registry import register
from formula_1_spark.sources.tables import load_table


@register(
    "map_functions_battery",
    ops="EXT-maps,A1 (MapType HOF coverage)",
    doc="Per-user event-type count maps exercised through the MapType "
    "HOF surface: map_from_entries over SORTED collect_list entries "
    "(deterministic map build), element_at lookups (NULL on miss), "
    "transform_values, map_filter, map_zip_with (3x via self-zip with "
    "doubled values), map_concat with a sentinel total entry, and "
    "sorted map_keys head. All outputs scalar; the oracle computes the "
    "same answers relationally (conditional aggregates), proving the "
    "map semantics rather than assuming DuckDB's map type.",
    oracle="""
WITH per AS (
  SELECT user_id, event_type, COUNT(1) AS cnt
  FROM events GROUP BY user_id, event_type
)
SELECT user_id,
       CAST(COUNT(1) AS INT) AS n_types,
       MAX(CASE WHEN event_type = 'click' THEN cnt END) AS clicks,
       MAX(CASE WHEN event_type = 'click' THEN cnt * 2 END) AS clicks_doubled,
       MAX(CASE WHEN event_type = 'click' THEN cnt * 3 END) AS clicks_tripled,
       CAST(COUNT(CASE WHEN cnt > 15 THEN 1 END) AS INT) AS n_frequent,
       MIN(event_type) AS first_type,
       CAST(SUM(cnt) AS BIGINT) AS total_events
FROM per
GROUP BY user_id
""",
)
def map_functions_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    per = events.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("cnt"))
    # Deterministic map build: sort the entry array before map_from_entries
    # (collect_list order is partition-dependent; the sort pins it).
    m = per.groupBy("user_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("event_type", "cnt")))
        ).alias("m")
    )
    doubled = F.transform_values(F.col("m"), lambda k, v: v * 2)
    tripled = F.map_zip_with(F.col("m"), doubled, lambda k, v1, v2: v1 + v2)
    with_total = F.map_concat(
        F.col("m"),
        F.create_map(
            F.lit("_total"),
            F.aggregate(F.map_values("m"), F.lit(0).cast("bigint"), lambda a, v: a + v),
        ),
    )
    return m.select(
        "user_id",
        F.size("m").alias("n_types"),
        F.element_at(F.col("m"), "click").alias("clicks"),
        F.element_at(doubled, "click").alias("clicks_doubled"),
        F.element_at(tripled, "click").alias("clicks_tripled"),
        F.size(F.map_filter(F.col("m"), lambda k, v: v > 15)).alias("n_frequent"),
        F.sort_array(F.map_keys("m"))[0].alias("first_type"),
        F.element_at(with_total, "_total").alias("total_events"),
    )
