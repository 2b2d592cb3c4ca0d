"""Columnar/line-format round-trip queries: ORC and JSON-lines.

Each query WRITES a derived copy of a driver table in another storage
format (ORC with partition layout; JSONL), reads it back through the
matching Spark source, and aggregates — while the oracle aggregates the
original parquet directly. A dropped row, a type coercion, a partition
mis-write, or an encoding bug in either direction reds the driver row,
so the round-trip itself is what is verified, not just the final agg.

Fixtures are fingerprint-keyed and atomically published
(``sources/fixtures.py``), so a driver testdata regeneration rebuilds
them instead of serving stale bytes.

Reference parity: the reference's lake is parquet/JSON only
(`Clean Bronze Data.py`); ORC is an extension surface — same engine
path (DataSource V1 write → V2 scan), different codec.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from formula_1_spark.queries.registry import register
from formula_1_spark.sources.fixtures import building_dir, fixture_root, publish
from formula_1_spark.sources.tables import load_table


def _orc_fixture(spark: SparkSession, sf_dir: str) -> str:
    """Orders re-written as ORC, hive-partitioned by o_orderpriority."""
    root = fixture_root("orc_orders_v1", sf_dir, "orders")
    if os.path.exists(os.path.join(root, "_SUCCESS")):
        return root
    building = building_dir(root)
    (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderpriority",
        )
        .write.mode("overwrite")
        .partitionBy("o_orderpriority")
        .orc(building)
    )
    publish(building, root)
    return root


def _jsonl_fixture(spark: SparkSession, sf_dir: str) -> str:
    """Events serialized as JSON lines (timestamps as micros epoch —
    JSON has no timestamp type; integer micros round-trip exactly)."""
    root = fixture_root("jsonl_events_v1", sf_dir, "events")
    if os.path.exists(os.path.join(root, "_SUCCESS")):
        return root
    building = building_dir(root)
    (
        load_table(spark, sf_dir, "events")
        .select(
            "event_id",
            "user_id",
            "event_type",
            "value",
            F.unix_micros("ts").alias("ts_us"),
        )
        .write.mode("overwrite")
        .json(building)
    )
    publish(building, root)
    return root


@register(
    "orc_roundtrip_summary",
    ops="S6-alt,S7-alt,P7,A1 (ORC sink+source with partition pruning)",
    doc="ORC round-trip: orders written as hive-partitioned ORC "
    "(partition key o_orderpriority), read back through the ORC scan "
    "with a partition filter (only the URGENT/HIGH directories are "
    "listed — partition pruning, not data filtering), aggregated per "
    "(priority, status) with an exact DECIMAL(18,2) price sum. Oracle "
    "aggregates the original parquet — the ORC write/read must "
    "round-trip every row, type, and partition assignment exactly.",
    oracle="""
SELECT o_orderpriority, o_orderstatus,
       COUNT(1) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
GROUP BY o_orderpriority, o_orderstatus
""",
)
def orc_roundtrip_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _orc_fixture(spark, sf_dir)
    orc = spark.read.orc(path)
    return (
        orc.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .groupBy("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
    )


@register(
    "jsonl_roundtrip_events",
    ops="S2,S5,A1 (JSON-lines sink+source round-trip)",
    doc="JSON-lines round-trip: events serialized to JSONL (timestamps "
    "as integer micros — JSON has no timestamp type), re-read through "
    "spark.read.json with an explicit schema (no sampling-based "
    "inference in a pipeline path), aggregated per event_type with "
    "exact integer value-cents and micros bounds. Oracle aggregates "
    "the original parquet.",
    oracle="""
SELECT event_type,
       COUNT(1) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
       MIN(epoch_us(ts)) AS first_us,
       MAX(epoch_us(ts)) AS last_us
FROM events
GROUP BY event_type
""",
)
def jsonl_roundtrip_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _jsonl_fixture(spark, sf_dir)
    ev = spark.read.schema(
        "event_id BIGINT, user_id BIGINT, event_type STRING, "
        "value DOUBLE, ts_us BIGINT"
    ).json(path)
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.floor(F.col("value") * 100).cast("bigint")).alias("value_cents"),
        F.min("ts_us").alias("first_us"),
        F.max("ts_us").alias("last_us"),
    )


# ---------------------------------------------------------------------------
# XML round-trip (round 10) — Spark 4's built-in XML source
# ---------------------------------------------------------------------------


def _xml_fixture(spark: SparkSession, sf_dir: str) -> str:
    """Customers serialized as XML (one <customer> element per row;
    account balance as integer cents — XML is text, exact integers
    round-trip; the raw double would re-parse through a decimal
    formatter)."""
    root = fixture_root("xml_customer_v1", sf_dir, "customer")
    if os.path.exists(os.path.join(root, "_SUCCESS")):
        return root
    building = building_dir(root)
    (
        load_table(spark, sf_dir, "customer")
        .select(
            "c_custkey",
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") * 100).cast("bigint").alias("bal_cents"),
        )
        .write.mode("overwrite")
        .format("xml")
        .option("rootTag", "customers")
        .option("rowTag", "customer")
        .save(building)
    )
    publish(building, root)
    return root


@register(
    "xml_roundtrip_customers",
    ops="S2-alt,S5-alt,A1 (built-in XML sink+source round-trip)",
    doc="XML round-trip over Spark 4's BUILT-IN XML source (StaxXML — "
    "the spark-xml package folded into core): customers serialized as "
    "<customer> row elements with balances as integer cents (XML is "
    "text; exact integers survive the round-trip where raw doubles "
    "would re-parse through a formatter), read back with an explicit "
    "schema (no inference pass in a pipeline path), aggregated per "
    "(nation, segment). The oracle aggregates the original parquet, so "
    "a dropped element, tag mis-nesting, or numeric coercion reds the "
    "row. Same fingerprint-keyed atomic fixture contract as the "
    "ORC/JSONL round-trips.",
    oracle="""
SELECT c_nationkey, c_mktsegment,
       CAST(COUNT(1) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(FLOOR(c_acctbal * 100) AS BIGINT)) AS BIGINT)
         AS bal_cents_sum,
       CAST(MAX(c_custkey) AS BIGINT) AS max_custkey
FROM customer
GROUP BY c_nationkey, c_mktsegment
ORDER BY c_nationkey, c_mktsegment
""",
)
def xml_roundtrip_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _xml_fixture(spark, sf_dir)
    xml = (
        spark.read.format("xml")
        .option("rowTag", "customer")
        .schema(
            "c_custkey BIGINT, c_nationkey BIGINT, c_mktsegment STRING,"
            " bal_cents BIGINT"
        )
        .load(path)
    )
    return (
        xml.groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.sum("bal_cents").cast("bigint").alias("bal_cents_sum"),
            F.max("c_custkey").cast("bigint").alias("max_custkey"),
        )
        .orderBy("c_nationkey", "c_mktsegment")
    )
