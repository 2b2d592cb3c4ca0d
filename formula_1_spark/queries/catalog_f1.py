"""Catalog/CTAS surface (SURVEY §2.1 S8/S9) and the F1 medallion gold
mart exposed through the driver contract.

``ctas_priority_summary`` runs a real ``CREATE TABLE ... AS SELECT``
through the session catalog then queries the table back — the
``Data Visualization.sql:18-41`` pattern.

``f1_gold_driver_standings`` runs the full fixture-ingest → bronze →
silver → gold pipeline (reference parity surface) and returns the
driverStandings mart. No SQL oracle (the F1 fixture lake isn't a driver
table) — rows-only check here; exact values are pinned by the golden
pytest suite.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from formula_1_spark.queries.registry import register
from formula_1_spark.sources.tables import load_tables


@register(
    "ctas_priority_summary",
    ops="S8,S9,A5",
    doc="CTAS into the session catalog + read-back (Data "
    "Visualization.sql:18-41 pattern).",
    oracle="""
SELECT o_orderpriority,
       COUNT(1) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY o_orderpriority
""",
)
def ctas_priority_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ["orders"], register=True)
    spark.sql("DROP TABLE IF EXISTS priority_summary")
    # A fresh in-memory catalog can't see a previous session's managed
    # table, but its warehouse directory survives on disk and blocks the
    # CTAS with LOCATION_ALREADY_EXISTS — clear the orphan explicitly.
    import shutil

    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    shutil.rmtree(os.path.join(warehouse, "priority_summary"), ignore_errors=True)
    spark.sql(
        """
        CREATE TABLE priority_summary USING parquet AS
        SELECT o_orderpriority,
               COUNT(1) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        FROM orders
        GROUP BY o_orderpriority
        """
    )
    return spark.table("priority_summary")


# Deterministic location (version-tagged) so the registered oracle SQL —
# a static string — can read the gold raceResults parquet back and
# recompute the standings mart differentially in DuckDB. The Spark query
# always runs before its oracle in the driver's compare, so the lake
# exists by oracle time.
F1_FIXTURE_LAKE = os.path.join(tempfile.gettempdir(), "f1_fixture_lake_v2")


@register(
    "f1_gold_driver_standings",
    ops="S1-S7,P1-P8,A1,A3,J1-J4,W1 (reference medallion end-to-end)",
    doc="Full reference-parity pipeline: fixture Ergast ingest → flatten "
    "→ silver specs → gold driverStandings (lossy-join + competition-rank "
    "quirks). The oracle recomputes the gold mart (A3 conditional-count "
    "agg + W1 competition rank, Transform Silver Data.py:128-139 shape) "
    "from the pipeline's own raceResults parquet — a differential check "
    "of the gold transform; upstream values are pinned by golden pytest.",
    oracle=f"""
WITH rr AS (
  SELECT * FROM read_parquet('{F1_FIXTURE_LAKE}/gold/raceResults/*.parquet')
),
agg AS (
  SELECT year, firstName, surname, nationality, constructorName,
         SUM(points) AS totalPoints,
         COUNT(CASE WHEN position = 1 THEN 1 END) AS wins
  FROM rr
  GROUP BY year, firstName, surname, nationality, constructorName
)
SELECT year, firstName, surname, nationality, constructorName,
       totalPoints, wins,
       CAST(RANK() OVER (
         PARTITION BY year ORDER BY totalPoints DESC, wins DESC
       ) AS INTEGER) AS rank
FROM agg
""",
)
def f1_gold_driver_standings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.config import EngineConfig
    from formula_1_spark.plans.medallion import clean_bronze, transform_silver
    from formula_1_spark.sources.ingest import fixture_fetchers, run_snapshot

    lake = F1_FIXTURE_LAKE
    if not os.path.isdir(os.path.join(lake, "gold", "driverStandings")):
        os.makedirs(lake, exist_ok=True)
        cfg = EngineConfig(lake_root=lake)
        snap = run_snapshot(cfg, fixture_fetchers(seasons=[2011, 2023]), limit=4)
        clean_bronze(spark, snapshot_dir=snap, cfg=cfg)
        transform_silver(spark, cfg=cfg)
    return spark.read.parquet(os.path.join(lake, "gold", "driverStandings"))
