"""Streaming-CDC-merge end-to-end exposed through the driver contract:
a change stream (updates + tombstones + late inserts over ``orders``)
is merged micro-batch-by-micro-batch into a snapshot-pointer table via
``stream_merge_into``; the query returns the final table state.

The oracle never sees the fixture lake — the change set is a pure
function of ``orders``, so the expected final state is recomputable as
static ANSI SQL over the driver's own view. That makes this a full
hash-checked E2E of: foreachBatch sink -> CDC seq resolution ->
manifest-pruned MERGE -> snapshot pointer read-back.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from formula_1_spark.queries.registry import register
from formula_1_spark.sources.fixtures import building_dir, fixture_root, publish
from formula_1_spark.sources.tables import load_table

_ORACLE = """
WITH base AS (
  SELECT o_orderkey, o_orderpriority, o_totalprice
  FROM orders WHERE o_orderkey % 3 <> 0
)
SELECT o_orderkey,
       CASE WHEN o_orderkey % 10 = 1 THEN '1-CDC2' ELSE o_orderpriority END
         AS o_orderpriority,
       o_totalprice
FROM base WHERE o_orderkey % 10 <> 4
UNION ALL
SELECT o_orderkey, o_orderpriority, o_totalprice
FROM orders WHERE o_orderkey % 3 = 0 AND o_orderkey % 10 = 0
"""

_CDC_SCHEMA = [
    "o_orderkey",
    "o_orderpriority",
    "o_totalprice",
    "seq",
    "is_delete",
]


@register(
    "cdc_stream_merge_orders",
    ops="EXT-cdc,S7,§2.9 (foreachBatch MERGE sink, seq resolution, pruned COW)",
    doc="Streaming CDC upsert E2E: base table, then a change stream "
    "(two same-key updates resolved by sequence, tombstone deletes, "
    "inserts) merged via foreachBatch into the manifest-pruned snapshot "
    "table; returns the final state, hash-checked against a closed-form "
    "oracle over orders.",
    oracle=_ORACLE,
)
def cdc_stream_merge_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.sources.io import merge_upsert, read_current
    from formula_1_spark.streaming.sink import stream_merge_into

    root = fixture_root("cdc_stream_lake_v1", sf_dir, "orders")
    target = os.path.join(root, "target")

    if not os.path.isdir(root):
        scratch = building_dir(root)
        os.makedirs(scratch, exist_ok=True)
        s_target = os.path.join(scratch, "target")
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority", "o_totalprice"
        )
        base = orders.filter(F.col("o_orderkey") % 3 != 0)
        merge_upsert(spark, s_target, base.repartitionByRange(4, "o_orderkey"),
                     ["o_orderkey"])

        key = F.col("o_orderkey")
        upd1 = base.filter(key % 10 == 1).select(
            key, F.lit("0-CDC1"), "o_totalprice", F.lit(1), F.lit(False)
        ).toDF(*_CDC_SCHEMA)
        upd2 = base.filter(key % 10 == 1).select(
            key, F.lit("1-CDC2"), "o_totalprice", F.lit(2), F.lit(False)
        ).toDF(*_CDC_SCHEMA)
        dels = base.filter(key % 10 == 4).select(
            key, "o_orderpriority", "o_totalprice", F.lit(3), F.lit(True)
        ).toDF(*_CDC_SCHEMA)
        ins = orders.filter((key % 3 == 0) & (key % 10 == 0)).select(
            key, "o_orderpriority", "o_totalprice", F.lit(1), F.lit(False)
        ).toDF(*_CDC_SCHEMA)
        changes = upd1.unionByName(upd2).unionByName(dels).unionByName(ins)

        src = os.path.join(scratch, "changes")
        changes.coalesce(1).write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema(changes.schema).parquet(src)
        q = stream_merge_into(
            stream,
            s_target,
            checkpoint=os.path.join(scratch, "ckpt"),
            key_cols=["o_orderkey"],
            seq_col="seq",
            delete_col="is_delete",
        )
        q.awaitTermination(300)
        publish(scratch, root)

    return read_current(spark, target)


_MATVIEW_ORACLE = """
WITH base AS (
  SELECT o_orderkey, o_orderpriority, o_totalprice
  FROM orders WHERE o_orderkey % 3 <> 0
),
final AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 10 = 1 THEN '1-CDC2' ELSE o_orderpriority END
           AS o_orderpriority,
         o_totalprice
  FROM base WHERE o_orderkey % 10 <> 4
  UNION ALL
  SELECT o_orderkey, o_orderpriority, o_totalprice
  FROM orders WHERE o_orderkey % 3 = 0 AND o_orderkey % 10 = 0
)
SELECT o_orderpriority, COUNT(1) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM final GROUP BY o_orderpriority
"""


@register(
    "matview_incremental_orders",
    ops="EXT-matview,A1,A5 (delta-maintained aggregate under MERGE churn)",
    doc="Materialized-view maintenance E2E: an aggregate table over the "
    "orders merge target is delta-refreshed through four merge rounds "
    "(two priority updates, tombstone deletes, inserts) without ever "
    "rescanning the base; the final maintained state hash-checks against "
    "a closed-form recompute over orders. Sums ride an exact DECIMAL so "
    "incremental +/- deltas equal the recompute bit-for-bit.",
    oracle=_MATVIEW_ORACLE,
)
def matview_incremental_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.plans.matview import merge_with_agg_refresh
    from formula_1_spark.sources.io import read_current

    root = fixture_root("matview_lake_v1", sf_dir, "orders")
    agg_path = os.path.join(root, "agg")

    if not os.path.isdir(root):
        scratch = building_dir(root)
        os.makedirs(scratch, exist_ok=True)
        base_path = os.path.join(scratch, "base")
        s_agg_path = os.path.join(scratch, "agg")
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey",
            "o_orderpriority",
            F.col("o_totalprice").cast("decimal(18,2)").alias("o_totalprice"),
        )
        key = F.col("o_orderkey")
        base = orders.filter(key % 3 != 0)

        def refresh(upd, **kw):
            merge_with_agg_refresh(
                spark, base_path, s_agg_path, upd,
                key_cols=["o_orderkey"],
                dims=["o_orderpriority"],
                sum_cols=["o_totalprice"],
                **kw,
            )

        refresh(base.repartitionByRange(4, "o_orderkey"))
        refresh(
            base.filter(key % 10 == 1).withColumn("o_orderpriority", F.lit("0-CDC1"))
        )
        refresh(
            base.filter(key % 10 == 1).withColumn("o_orderpriority", F.lit("1-CDC2"))
        )
        refresh(
            base.filter(key % 10 == 4).withColumn("is_delete", F.lit(True)),
            delete_col="is_delete",
        )
        refresh(orders.filter((key % 3 == 0) & (key % 10 == 0)))
        publish(scratch, root)

    return read_current(spark, agg_path).select(
        "o_orderpriority",
        "n_rows",
        F.col("sum_o_totalprice").cast("double").alias("sum_price"),
    )


@register(
    "orders_time_travel_diff",
    ops="EXT-time-travel,S8,A5 (versioned snapshot reads)",
    doc="Snapshot time travel through the driver gate: a merge target "
    "built in three rounds (base load -> priority update -> tombstone "
    "delete), then BOTH version 0 (snapshot_at, Delta versionAsOf "
    "analog) and the live _CURRENT state read back and aggregated per "
    "priority under a snapshot label. The oracle recomputes both "
    "versions closed-form from orders, so a wrong version resolution, a "
    "leaked update into v0, or a missed delete in the live state all "
    "red the row.",
    oracle="""
SELECT 'v0' AS snapshot, o_orderpriority,
       COUNT(1) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY o_orderpriority
UNION ALL
SELECT 'current' AS snapshot,
       CASE WHEN o_orderkey % 7 = 2 THEN '0-TTRAVEL' ELSE o_orderpriority END
         AS o_orderpriority,
       COUNT(1) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
WHERE o_orderkey % 5 <> 3
GROUP BY 1, 2
""",
)
def orders_time_travel_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.sources.io import merge_upsert, read_current, snapshot_at

    root = fixture_root("time_travel_lake_v1", sf_dir, "orders")
    target = os.path.join(root, "target")

    if not os.path.isdir(root):
        scratch = building_dir(root)
        os.makedirs(scratch, exist_ok=True)
        s_target = os.path.join(scratch, "target")
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey",
            "o_orderpriority",
            F.col("o_totalprice").cast("decimal(18,2)").alias("o_totalprice"),
        )
        key = F.col("o_orderkey")
        merge_upsert(
            spark, s_target, orders.repartitionByRange(4, "o_orderkey"), ["o_orderkey"]
        )
        merge_upsert(
            spark,
            s_target,
            orders.filter(key % 7 == 2).withColumn(
                "o_orderpriority", F.lit("0-TTRAVEL")
            ),
            ["o_orderkey"],
        )
        merge_upsert(
            spark,
            s_target,
            orders.filter(key % 5 == 3).withColumn("is_delete", F.lit(True)),
            ["o_orderkey"],
            delete_col="is_delete",
        )
        publish(scratch, root)

    def rollup(df: DataFrame, label: str) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("o_totalprice").cast("double").alias("total_price"),
        ).select(F.lit(label).alias("snapshot"), "*")

    v0 = spark.read.parquet(snapshot_at(target, 0))
    cur = read_current(spark, target)
    return rollup(v0, "v0").unionByName(rollup(cur, "current"))
