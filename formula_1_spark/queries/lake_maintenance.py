"""Lake-maintenance queries: compaction driven through the driver gate.

``orders_compaction_roundtrip`` materializes the small-files problem and
its fix end-to-end: orders land in a snapshot lake deliberately
fragmented into 64 undersized files (what merge churn produces), then
``compact_current`` rewrites the live snapshot right-sized (Delta
OPTIMIZE semantics: values untouched, atomic pointer swap). The
registered query reads the COMPACTED lake and aggregates; the oracle
aggregates the original parquet — so a single row lost, duplicated, or
type-drifted anywhere in fragment → compact → read-back reds the driver
row. File-layout assertions (64 → few) live in
``tests/test_round3_ops.py``; layout is engine-side metadata the SQL
oracle can't see.

Reference scope note: the reference rewrites whole tables per run
(`Clean Bronze Data.py` full-refresh writes); incremental maintenance
with compaction is part of this repo's extension lake surface
(``sources/io.py``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from formula_1_spark.queries.registry import register
from formula_1_spark.sources.fixtures import building_dir, fixture_root, publish
from formula_1_spark.sources.io import (
    _write_snapshot_and_repoint,
    compact_current,
    read_current,
)
from formula_1_spark.sources.tables import load_table

FRAGMENT_FILES = 64


def compacted_orders_lake(spark: SparkSession, sf_dir: str) -> str:
    """Build-once fixture: fragmented orders lake, then compacted."""
    root = fixture_root("compacted_orders_v1", sf_dir, "orders")
    if os.path.exists(os.path.join(root, "_CURRENT")):
        return root
    building = building_dir(root)
    os.makedirs(building, exist_ok=True)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    _write_snapshot_and_repoint(
        orders.repartition(FRAGMENT_FILES), building, key_cols=["o_orderkey"]
    )
    compact_current(spark, building, target_rows_per_file=1_000_000)
    publish(building, root)
    return root


@register(
    "orders_compaction_roundtrip",
    ops="S7-maint,A1 (small-file compaction with exact read-back)",
    doc="Small-files lifecycle E2E: orders fragmented into 64 files in a "
    "snapshot lake, compacted via compact_current (new right-sized "
    "snapshot + atomic repoint — readers never block), then read back "
    "and aggregated per order status with an exact DECIMAL(18,2) sum. "
    "Oracle aggregates the source parquet: compaction must preserve "
    "every row and value bit-for-bit.",
    oracle="""
SELECT o_orderstatus,
       COUNT(1) AS n_orders,
       COUNT(DISTINCT o_custkey) AS n_customers,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY o_orderstatus
""",
)
def orders_compaction_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    lake = compacted_orders_lake(spark, sf_dir)
    cur = read_current(spark, lake)
    return cur.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_price"),
    )


_ERASE_SQL = "('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 50 = 0"


def _erase_bucket() -> F.Column:
    return (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 50
    )


def erased_events_lake(spark: SparkSession, sf_dir: str) -> str:
    """Build-once fixture: events lake, then a right-to-be-forgotten
    MERGE deleting every event of the erased-user set (hash bucket 0 of
    50 — the deterministic stand-in for a deletion-request list)."""
    from formula_1_spark.sources.io import merge_upsert

    root = fixture_root("erased_events_v1", sf_dir, "events")
    if os.path.exists(os.path.join(root, "_CURRENT")):
        return root
    building = building_dir(root)
    os.makedirs(building, exist_ok=True)
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    merge_upsert(
        spark,
        building,
        events.repartitionByRange(4, "event_id"),
        ["event_id"],
    )
    erase = events.filter(_erase_bucket() == 0).withColumn(
        "is_delete", F.lit(True)
    )
    merge_upsert(spark, building, erase, ["event_id"], delete_col="is_delete")
    publish(building, root)
    return root


@register(
    "user_erasure_audit",
    ops="S7-maint,EXT-governance,A1 (right-to-be-forgotten MERGE delete)",
    doc="Data-governance erasure E2E: events land in a keyed snapshot "
    "lake, a deletion-request MERGE removes every event of the erased "
    "user set (hash bucket 0/50), and the post-erasure lake is "
    "aggregated per event_type (events, users, exact cents). Oracle "
    "computes the same aggregates from events EXCLUDING the erased "
    "users — a single surviving erased-user row, or an over-deleted "
    "innocent row, reds the driver row.",
    oracle=f"""
SELECT event_type,
       CAST(COUNT(1) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events
WHERE NOT ({_ERASE_SQL})
GROUP BY event_type
""",
)
def user_erasure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.sources.io import read_current

    lake = erased_events_lake(spark, sf_dir)
    cur = read_current(spark, lake)
    return cur.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.floor(F.col("value") * 100).cast("bigint")).alias("value_cents"),
    )


def evolved_orders_lake(spark: SparkSession, sf_dir: str) -> str:
    """Build-once fixture: a 2-column orders lake, then a schema-EVOLVING
    merge that adds o_orderpriority for keys % 5 == 0 — survivors keep a
    NULL in the new column (Delta mergeSchema semantics)."""
    from formula_1_spark.sources.io import merge_upsert

    root = fixture_root("evolved_orders_v1", sf_dir, "orders")
    if os.path.exists(os.path.join(root, "_CURRENT")):
        return root
    building = building_dir(root)
    os.makedirs(building, exist_ok=True)
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select("o_orderkey", "o_totalprice")
    merge_upsert(
        spark, building, base.repartitionByRange(4, "o_orderkey"), ["o_orderkey"]
    )
    widened = orders.filter(F.col("o_orderkey") % 5 == 0).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    merge_upsert(spark, building, widened, ["o_orderkey"], evolve_schema=True)
    publish(building, root)
    return root


@register(
    "schema_evolution_scan",
    ops="S7-evolve,A1 (mergeSchema lake read after column add)",
    doc="Schema evolution E2E: a 2-column orders lake widened by an "
    "evolving MERGE that adds o_orderpriority on 1-in-5 keys; the "
    "post-evolution scan groups by the new column with pre-evolution "
    "rows surfacing as NULL -> '<pre-evolution>'. Oracle replays the "
    "evolution closed-form from orders. A survivor row that lost its "
    "price, or a widened row that kept a NULL, reds the driver row.",
    oracle="""
SELECT CASE WHEN o_orderkey % 5 = 0 THEN o_orderpriority
            ELSE '<pre-evolution>' END AS priority,
       CAST(COUNT(1) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY 1
""",
)
def schema_evolution_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.sources.io import read_current

    lake = evolved_orders_lake(spark, sf_dir)
    cur = read_current(spark, lake)
    return cur.groupBy(
        F.coalesce("o_orderpriority", F.lit("<pre-evolution>")).alias("priority")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_price"),
    )
