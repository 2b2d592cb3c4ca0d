"""Parquet footer-statistics audit: distributed row-group stats harvesting
+ skipping analysis — the manifest-building primitive behind Delta/Iceberg
data skipping.

At 100 TB a lake has ~10^5-10^6 parquet files; planning which row groups a
predicate can skip must itself be distributed (the driver cannot stat a
million footers). The Spark side here reads footers with pyarrow inside
``mapInPandas`` over a file-path relation — footer reads are O(KB) each
regardless of file size, so the harvest scales with file COUNT, not data
volume. The DuckDB oracle reads the same footers via ``parquet_metadata``,
making this a true physical-layout differential (not a recomputation from
logical rows).

The audited lake is a CONSTANT fixture (deterministic ``spark.range``
content, sorted by key, written with a small parquet block size so files
split into multiple row groups) — the same static-oracle convention as the
F1 fixture lake in ``queries/catalog_f1.py``: the registered oracle is a
static string, so the path cannot vary with sf_dir.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from formula_1_spark.queries.registry import register

RG_FIXTURE_LAKE = os.path.join(tempfile.gettempdir(), "rg_audit_lake_v1")
_N_ROWS = 200_000
_N_FILES = 4

# Central 25%-35% key-range box: row groups wholly outside are skippable.
_LO = _N_ROWS * 25 // 100
_HI = _N_ROWS * 35 // 100


def _fixture_lake(spark: SparkSession) -> str:
    path = os.path.join(RG_FIXTURE_LAKE, "keyed")
    if not os.path.isdir(path):
        df = (
            spark.range(_N_ROWS)
            .select(
                F.col("id").alias("k"),
                F.expr("CAST(md5(CAST(id AS STRING)) AS STRING)").alias(
                    "payload"
                ),
            )
            .repartitionByRange(_N_FILES, "k")
            .sortWithinPartitions("k")
        )
        (
            df.write.mode("overwrite")
            # ~128 KiB row groups: each of the 4 sorted files splits into
            # many key-disjoint row groups — the layout min/max stats
            # pruning relies on.
            .option("parquet.block.size", 128 * 1024)
            .parquet(path)
        )
    return path


def _read_footers(spark: SparkSession, path: str) -> DataFrame:
    """(file_name, row_group_id, n_rows, min_k, max_k) via DISTRIBUTED
    pyarrow footer reads — one task per file batch, never the driver."""
    import pandas as pd  # noqa: PLC0415 - executor-side import mirrors UDF

    files = sorted(
        f for f in os.listdir(path) if f.endswith(".parquet")
    )
    paths_df = spark.createDataFrame(
        [(os.path.join(path, f),) for f in files], "path string"
    ).repartition(min(len(files), 32))

    def harvest(batches):
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for p in pdf["path"]:
                md = pq.ParquetFile(p).metadata
                col_idx = next(
                    i
                    for i in range(len(md.schema.names))
                    if md.schema.column(i).name == "k"
                )
                base = os.path.basename(p)
                for rg in range(md.num_row_groups):
                    g = md.row_group(rg)
                    st = g.column(col_idx).statistics
                    rows.append(
                        (base, rg, g.num_rows, int(st.min), int(st.max))
                    )
            yield pd.DataFrame(
                rows,
                columns=["file_name", "row_group_id", "n_rows", "min_k", "max_k"],
            )

    return paths_df.mapInPandas(
        harvest,
        "file_name string, row_group_id int, n_rows bigint, "
        "min_k bigint, max_k bigint",
    )


@register(
    "parquet_rowgroup_skipping_audit",
    ops="EXT-lake-stats,S6,A1 (distributed footer-stats manifest)",
    doc="Row-group skipping audit over a sorted parquet lake: harvest "
    "per-row-group (rows, min, max) key statistics from the footers with "
    "pyarrow inside mapInPandas (distributed manifest build — O(KB) per "
    "footer, scales with file count, driver never stats a file), then "
    "score a central 25-35% key-range predicate: a row group is "
    "skippable iff its [min,max] misses the box entirely. Reports per "
    "file: row groups, rows, skippable row groups/rows and skip ppm — "
    "the data-skipping evidence Delta/Iceberg manifests provide, built "
    "here first-principles. Oracle reads the SAME footers via DuckDB "
    "parquet_metadata, so the check is a physical-layout differential.",
    oracle=f"""
WITH rg AS (
  SELECT regexp_extract(file_name, '[^/]+$') AS file_name,
         row_group_id,
         CAST(row_group_num_rows AS BIGINT) AS n_rows,
         CAST(stats_min_value AS BIGINT) AS min_k,
         CAST(stats_max_value AS BIGINT) AS max_k
  FROM parquet_metadata('{RG_FIXTURE_LAKE}/keyed/*.parquet')
  WHERE path_in_schema = 'k'
),
flagged AS (
  SELECT *,
         CASE WHEN max_k < {_LO} OR min_k > {_HI} THEN 1 ELSE 0 END
           AS skippable
  FROM rg
)
SELECT file_name,
       CAST(COUNT(1) AS BIGINT) AS n_rowgroups,
       CAST(SUM(n_rows) AS BIGINT) AS n_rows,
       CAST(SUM(skippable) AS BIGINT) AS rg_skippable,
       CAST(SUM(CASE WHEN skippable = 1 THEN n_rows ELSE 0 END) AS BIGINT)
         AS rows_skippable,
       CAST(SUM(CASE WHEN skippable = 1 THEN n_rows ELSE 0 END) * 1000000
            // SUM(n_rows) AS BIGINT) AS skip_ppm
FROM flagged
GROUP BY file_name
ORDER BY file_name
""",
)
def parquet_rowgroup_skipping_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    path = _fixture_lake(spark)
    rg = _read_footers(spark, path)
    flagged = rg.withColumn(
        "skippable",
        F.when(
            (F.col("max_k") < F.lit(_LO)) | (F.col("min_k") > F.lit(_HI)), 1
        ).otherwise(0),
    )
    return (
        flagged.groupBy("file_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rowgroups"),
            F.sum("n_rows").cast("bigint").alias("n_rows"),
            F.sum("skippable").cast("bigint").alias("rg_skippable"),
            F.sum(F.when(F.col("skippable") == 1, F.col("n_rows")).otherwise(0))
            .cast("bigint")
            .alias("rows_skippable"),
            F.expr(
                "CAST(sum(CASE WHEN skippable = 1 THEN n_rows ELSE 0 END)"
                " * 1000000 div sum(n_rows) AS BIGINT)"
            ).alias("skip_ppm"),
        )
        .orderBy("file_name")
    )


# ---------------------------------------------------------------------------
# Parquet aggregate pushdown (DSv2 footer-served aggregates, round 10)
# ---------------------------------------------------------------------------


@register(
    "parquet_agg_pushdown_scan",
    ops="EXT-agg-pushdown,S6,A5 (scan-level COUNT/MIN/MAX from footers)",
    doc="Parquet AGGREGATE pushdown: COUNT(*)/MIN/MAX answered by the "
    "DSv2 ParquetScan from row-group footer statistics — zero data pages "
    "read, the cheapest possible full-table profile at 100 TB (cost = "
    "footer count, not bytes). The fn flips the session to the V2 "
    "parquet path + aggregatePushdown for exactly this plan, ASSERTS "
    "'PushedAggregation' in the executed plan of each scan (a "
    "non-pushed plan raises, so driver green IS the pushdown proof), "
    "materializes the one aggregate row per fact table while the confs "
    "are active, and restores the session confs. Oracle recomputes the "
    "same profile from rows — a footer-stat lie (stale min/max, wrong "
    "row count) hash-mismatches.",
    oracle="""
SELECT 'orders' AS tbl, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
       CAST(MAX(o_orderkey) AS BIGINT) AS max_key
FROM orders
UNION ALL
SELECT 'lineitem', CAST(COUNT(*) AS BIGINT),
       CAST(MIN(l_orderkey) AS BIGINT), CAST(MAX(l_orderkey) AS BIGINT)
FROM lineitem
ORDER BY tbl
""",
)
def parquet_agg_pushdown_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOTE: the session-global conf flip assumes a single-threaded session
    # (the driver/bench/pytest harnesses all plan queries sequentially). A
    # query planned CONCURRENTLY in the same SparkSession during this
    # window would silently take the V2 parquet path; if a concurrent
    # harness ever appears, scope these confs to a cloned session
    # (spark.newSession()) instead.
    conf = spark.conf
    old_v1 = conf.get("spark.sql.sources.useV1SourceList", None)
    old_pd = conf.get("spark.sql.parquet.aggregatePushdown", None)
    rows = []
    try:
        conf.set("spark.sql.sources.useV1SourceList", "")
        conf.set("spark.sql.parquet.aggregatePushdown", "true")
        for tbl, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
            df = spark.read.parquet(
                os.path.join(sf_dir, f"{tbl}.parquet")
            ).selectExpr(
                "count(*) AS n_rows",
                f"min({key}) AS min_key",
                f"max({key}) AS max_key",
            )
            plan = df._jdf.queryExecution().executedPlan().toString()
            # Loose match on purpose: the exact rendering of the pushed
            # aggregate list ("[COUNT(*), MIN(...)...]") varies across
            # Spark versions; require the PushedAggregation marker plus
            # evidence a COUNT and a MIN/MAX actually pushed.
            pushed = "PushedAggregation" in plan and (
                "COUNT" in plan and ("MIN" in plan or "MAX" in plan)
            )
            if not pushed:
                raise RuntimeError(
                    f"aggregate pushdown did not reach the {tbl} scan:\n{plan}"
                )
            r = df.collect()[0]
            rows.append((tbl, r["n_rows"], r["min_key"], r["max_key"]))
    finally:
        # Restore BEFORE returning: leaving parquet on the V2 path would
        # silently re-plan every later query in this shared session.
        if old_v1 is None:
            conf.unset("spark.sql.sources.useV1SourceList")
        else:
            conf.set("spark.sql.sources.useV1SourceList", old_v1)
        if old_pd is None:
            conf.unset("spark.sql.parquet.aggregatePushdown")
        else:
            conf.set("spark.sql.parquet.aggregatePushdown", old_pd)
    out = spark.createDataFrame(
        rows, "tbl string, n_rows bigint, min_key bigint, max_key bigint"
    )
    return out.orderBy("tbl")
