"""SparkSession factory tuned for the engine.

Single place where execution-relevant Spark conf is set so tests, bench and
the driver contract all run the same way. Designed for a multi-executor
cluster (AQE, skew-join handling, sane shuffle partitioning) but works on
``local[N]``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "formula_1_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # Local mode: match cores. On a real cluster this would be
        # ~2-3x total executor cores (set via extra_conf / spark-submit).
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # NOTE on sizing shuffle_partitions: AQE can COALESCE small
        # partitions but can never split beyond the initial number, so
        # this knob must scale with the data (the round-8 30x curve check
        # measured exactsubstr_threshold_curve at 24.5 s with 32
        # partitions vs 14.6 s with 96 at 30x sf0.1 — same plan, pure
        # per-partition memory pressure). On a cluster set it to ~2-3x
        # total executor cores via the parameter / extra_conf; a global
        # adaptive.coalescePartitions.initialPartitionNum=4x default was
        # tried and REJECTED — it regressed the sf0.1 suite 392.7 ->
        # 533.0 s (per-stage scheduling overhead on hundreds of small
        # stages outweighs the spill relief; see PERF.md round 8).
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Runtime bloom-filter pushdown: a selective filter on one join
        # side injects a bloom test into the other side's scan — at 100 TB
        # this prunes fact partitions before the shuffle (explicit so a
        # version default change never silently turns it off).
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "64MB")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
