"""Driver-checked E2E query for the custom Python DataSource
(sources/paged_api.py): build a deterministic paged-JSON "API" fixture
from the orders table, ingest it back through the partition-parallel
source, and aggregate — the oracle runs the same aggregate on orders
directly, so a wrong page split, a dropped row, or a type mismatch in
the source reds the driver row.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from formula_1_spark.queries.registry import register
from formula_1_spark.sources.fixtures import building_dir, fixture_root, publish
from formula_1_spark.sources.paged_api import PagedJsonApiSource
from formula_1_spark.sources.tables import load_table

_SCHEMA_DDL = (
    "o_orderkey BIGINT, o_custkey BIGINT, o_orderpriority STRING, "
    "o_totalprice DOUBLE"
)


def _pages_fixture(spark: SparkSession, sf_dir: str) -> str:
    """Write orders as 16 JSONL 'API pages' once per (host, source
    fingerprint); reuse on later calls. The cache key folds in the orders
    parquet's size+mtime, so a driver testdata regeneration invalidates
    the fixture instead of silently serving stale pages. Built to a temp
    dir and atomically renamed so concurrent sessions never read a
    half-written fixture."""
    root = fixture_root("paged_api_fixture_v1", sf_dir, "orders")
    if os.path.exists(os.path.join(root, "_SUCCESS")):
        return root
    building = building_dir(root)
    (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice")
        .withColumn("page", F.col("o_orderkey") % 16)
        .repartition(16, "page")
        .write.mode("overwrite")
        .partitionBy("page")
        .json(building)
    )
    publish(building, root)
    return root


@register(
    "paged_api_source_ingest",
    ops="S1,EXT-python-datasource (partition-parallel page ingest)",
    doc="Spark 4 Python DataSource API E2E: orders serialized to 16 "
    "JSONL 'API pages', re-ingested through the custom paged_json_api "
    "source (one InputPartition per 2 pages — the crawl parallelizes "
    "across executors instead of a driver loop), aggregated per "
    "priority. Oracle aggregates orders directly, so the source must "
    "round-trip every row and type exactly.",
    oracle="""
SELECT o_orderpriority,
       COUNT(1) AS n_orders,
       COUNT(DISTINCT o_custkey) AS n_customers,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY o_orderpriority
""",
)
def paged_api_source_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.dataSource.register(PagedJsonApiSource)
    pages = _pages_fixture(spark, sf_dir)
    api = (
        spark.read.format("paged_json_api")
        .option("path", pages)
        .option("schema_ddl", _SCHEMA_DDL)
        .option("pages_per_partition", "2")
        .load()
    )
    return api.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_price"),
    )


@register(
    "paged_api_sink_roundtrip",
    ops="S5-alt,EXT-python-datasource-writer (two-phase-commit page sink)",
    doc="Spark 4 Python DataSource WRITER E2E: orders written THROUGH "
    "the custom paged_json_api sink (each task stages a page, driver "
    "commit renames all-or-nothing — a failed task never publishes a "
    "partial page), re-read through the matching reader, aggregated "
    "per priority. Oracle aggregates orders directly: the sink/source "
    "pair must round-trip every row and double bit-for-bit.",
    oracle="""
SELECT o_orderpriority,
       COUNT(1) AS n_orders,
       COUNT(DISTINCT o_custkey) AS n_customers,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY o_orderpriority
""",
)
def paged_api_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.sources.fixtures import (
        building_dir,
        fixture_root,
        publish,
    )

    spark.dataSource.register(PagedJsonApiSource)
    root = fixture_root("paged_api_sink_v1", sf_dir, "orders")
    if not os.path.exists(os.path.join(root, "_DONE")):
        building = building_dir(root)
        os.makedirs(building, exist_ok=True)
        pages = os.path.join(building, "pages")
        (
            load_table(spark, sf_dir, "orders")
            .select("o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice")
            .repartition(8)
            .write.format("paged_json_api")
            .option("path", pages)
            .mode("overwrite")
            .save()
        )
        with open(os.path.join(building, "_DONE"), "w") as fh:
            fh.write("ok")
        publish(building, root)
    api = (
        spark.read.format("paged_json_api")
        .option("path", os.path.join(root, "pages"))
        .option("schema_ddl", _SCHEMA_DDL)
        .option("pages_per_partition", "2")
        .load()
    )
    return api.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_price"),
    )
