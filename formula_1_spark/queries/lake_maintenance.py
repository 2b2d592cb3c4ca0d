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


# ---------------------------------------------------------------------------
# Bucketed checksum reconciliation (round 9)
# ---------------------------------------------------------------------------

_CK_BUCKET = 1024  # orderkeys per checksum bucket
_CK_MUT = 9973  # keys % this get a value mutation in snapshot B
_CK_DEL = 15013  # keys % this are deleted in snapshot B

# Two independent 30-bit checksum components per bucket (low/high halves
# of the 60-bit row hash), each summed exactly in int64 — a bucket of up
# to ~9e9 rows stays overflow-free, and matching BOTH components makes a
# silent collision astronomically unlikely.
_CK_ROW = (
    "('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || '|' "
    "|| CAST(o_custkey AS VARCHAR) || '|' || o_orderstatus || '|' "
    "|| CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR)), "
    "1, 15))::BIGINT"
)


@register(
    "orders_checksum_reconcile",
    ops="EXT-lake-reconcile,A1,J4 (bucketed anti-entropy diff)",
    doc="Anti-entropy reconciliation between two table snapshots without "
    "a row-level compare: hash every row once (60-bit md5 over the "
    "business columns, prices on the exact cent grid), fold into "
    f"per-bucket (orderkey div {_CK_BUCKET}) counts plus two summed "
    "30-bit checksum components, and full-outer-join the two bucket "
    "manifests — only buckets whose (count, low, high) triple disagrees "
    "surface, localizing the diff to key ranges. Snapshot B is derived "
    "in-plan (deterministic mutation of keys % "
    f"{_CK_MUT}, deletion of keys % {_CK_DEL}) so the op is "
    "fixture-free. This is how replicas diff at 100 TB: shuffle volume "
    "is ONE row per bucket per side, never rows.",
    oracle=f"""
WITH a AS (
  SELECT o_orderkey // {_CK_BUCKET} AS bucket, {_CK_ROW} AS h
  FROM orders
),
b_src AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         CASE WHEN o_orderkey % {_CK_MUT} = 0
              THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice
  FROM orders WHERE o_orderkey % {_CK_DEL} <> 0
),
b AS (
  SELECT o_orderkey // {_CK_BUCKET} AS bucket, {_CK_ROW} AS h
  FROM b_src
),
ma AS (
  SELECT bucket, CAST(COUNT(1) AS BIGINT) AS n,
         CAST(SUM(h % 1073741824) AS BIGINT) AS lo,
         CAST(SUM(h // 1073741824) AS BIGINT) AS hi
  FROM a GROUP BY bucket
),
mb AS (
  SELECT bucket, CAST(COUNT(1) AS BIGINT) AS n,
         CAST(SUM(h % 1073741824) AS BIGINT) AS lo,
         CAST(SUM(h // 1073741824) AS BIGINT) AS hi
  FROM b GROUP BY bucket
)
SELECT CAST(COALESCE(ma.bucket, mb.bucket) AS BIGINT) AS bucket,
       CAST(COALESCE(ma.n, 0) AS BIGINT) AS rows_a,
       CAST(COALESCE(mb.n, 0) AS BIGINT) AS rows_b,
       COALESCE(ma.n, 0) = COALESCE(mb.n, 0) AS counts_match
FROM ma FULL OUTER JOIN mb ON mb.bucket = ma.bucket
WHERE ma.bucket IS NULL OR mb.bucket IS NULL
   OR ma.n <> mb.n OR ma.lo <> mb.lo OR ma.hi <> mb.hi
ORDER BY bucket
""",
)
def orders_checksum_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    row_h = F.expr(
        "CAST(conv(substring(md5(concat_ws('|', CAST(o_orderkey AS STRING), "
        "CAST(o_custkey AS STRING), o_orderstatus, "
        "CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS STRING))), 1, 15), "
        "16, 10) AS BIGINT)"
    )

    def manifest(df: DataFrame) -> DataFrame:
        return (
            df.select(
                F.expr(f"o_orderkey div {_CK_BUCKET}").alias("bucket"),
                row_h.alias("h"),
            )
            .groupBy("bucket")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.sum(F.expr("h % 1073741824")).cast("bigint").alias("lo"),
                F.sum(F.expr("h div 1073741824")).cast("bigint").alias("hi"),
            )
        )

    snap_b = orders.filter(F.expr(f"o_orderkey % {_CK_DEL} <> 0")).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.expr(
            f"CASE WHEN o_orderkey % {_CK_MUT} = 0 THEN o_totalprice + 1.0 "
            "ELSE o_totalprice END"
        ).alias("o_totalprice"),
    )
    ma = manifest(orders).select(
        F.col("bucket").alias("a_bucket"), F.col("n").alias("a_n"),
        F.col("lo").alias("a_lo"), F.col("hi").alias("a_hi"),
    )
    mb = manifest(snap_b).select(
        F.col("bucket").alias("b_bucket"), F.col("n").alias("b_n"),
        F.col("lo").alias("b_lo"), F.col("hi").alias("b_hi"),
    )
    joined = ma.join(mb, ma.a_bucket == mb.b_bucket, "full_outer")
    return (
        joined.filter(
            F.col("a_bucket").isNull()
            | F.col("b_bucket").isNull()
            | (F.col("a_n") != F.col("b_n"))
            | (F.col("a_lo") != F.col("b_lo"))
            | (F.col("a_hi") != F.col("b_hi"))
        )
        .select(
            F.coalesce("a_bucket", "b_bucket").cast("bigint").alias("bucket"),
            F.coalesce("a_n", F.lit(0)).cast("bigint").alias("rows_a"),
            F.coalesce("b_n", F.lit(0)).cast("bigint").alias("rows_b"),
            (
                F.coalesce("a_n", F.lit(0)) == F.coalesce("b_n", F.lit(0))
            ).alias("counts_match"),
        )
        .orderBy("bucket")
    )
