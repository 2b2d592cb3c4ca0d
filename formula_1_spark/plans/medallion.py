"""Medallion pipeline: bronze JSON → silver typed tables → gold marts.

Spark-first re-expression of the reference notebooks:

* :func:`clean_bronze` ≙ ``Notebooks/Clean Bronze Data.py`` — read each
  endpoint folder of an ingest snapshot with ``spark.read.json``, flatten,
  apply the declarative silver spec, write parquet. One narrow
  scan→project→explode→write pipeline per dataset — shuffle-free, scales
  linearly with input files.
* :func:`transform_silver` ≙ ``Notebooks/Transform Silver Data.py`` —
  pitstop pre-aggregate (A1), 4-way join J1-J4 (broadcast dims, compound
  key vs the aggregate, INNER for parity with quirk #3 — ``left`` behind
  the config flag), qualified projection (P5), standings marts (A3/A4 +
  W1 competition rank).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from formula_1_spark.config import DEFAULT_CONFIG, EngineConfig
from formula_1_spark.operators.aggregates import conditional_count_agg, pre_aggregate
from formula_1_spark.operators.joins import compound_key_join, dim_join
from formula_1_spark.operators.windows import rank_standings
from formula_1_spark.plans.flatten import flatten_json
from formula_1_spark.plans.schema_spec import SPECS, apply_spec
from formula_1_spark.sources.io import latest_snapshot, write_parquet


def clean_bronze(
    spark: SparkSession,
    snapshot_dir: str | None = None,
    cfg: EngineConfig = DEFAULT_CONFIG,
    endpoints: list[str] | None = None,
) -> dict[str, str]:
    """Bronze → silver for every endpoint folder in the newest (or given)
    snapshot. Returns {dataset: silver_path}."""
    snap = snapshot_dir or latest_snapshot(cfg.bronze)
    out: dict[str, str] = {}
    for entry in sorted(os.scandir(snap), key=lambda e: e.name):
        if not entry.is_dir() or entry.name not in SPECS:
            continue
        df = spark.read.json(entry.path)
        flat = flatten_json(df)
        silver = apply_spec(flat, SPECS[entry.name], ingestion_tz=cfg.ingestion_tz)
        path = os.path.join(cfg.silver, entry.name)
        write_parquet(silver, path)
        out[entry.name] = path
        if endpoints is not None and entry.name not in endpoints:
            continue
    return out


def build_race_results(
    results: DataFrame,
    drivers: DataFrame,
    constructors: DataFrame,
    circuits: DataFrame,
    pitstops: DataFrame,
    lossy_pitstop_join: bool = True,
) -> DataFrame:
    """Gold ``raceResults``: A1 + J1-J4 + P5
    (``Transform Silver Data.py:92-124``).

    ``lossy_pitstop_join=True`` reproduces the reference INNER join
    (quirk #3: races/drivers without a recorded pitstop vanish);
    ``False`` is the corrected LEFT variant.
    """
    # A1: one row per (circuitRef, date, driverRef) before the join.
    pit_agg = pre_aggregate(
        pitstops,
        ["circuitRef", "date", "driverRef"],
        {"numberOfPitstops": F.max("stopNo")},
    )

    # J1-J3: broadcast dimension joins on ref keys.
    joined = dim_join(results, drivers, "driverRef")
    joined = dim_join(joined, constructors, "constructorRef")
    joined = dim_join(joined, circuits, "circuitRef")

    # J4: compound-key join to the pre-aggregate.
    how = "inner" if lossy_pitstop_join else "left"
    joined = compound_key_join(
        joined, pit_agg, ["circuitRef", "date", "driverRef"], how=how
    )

    # P5: qualified 16-column projection (Transform Silver Data.py:105-120).
    return joined.select(
        "raceName",
        "year",
        "date",
        "circuitName",
        "locality",
        "country",
        "firstName",
        "surname",
        "nationality",
        "constructorName",
        "startGrid",
        "position",
        "points",
        "lapsCompleted",
        "fastestLapTime",
        "numberOfPitstops",
    )


def build_driver_standings(race_results: DataFrame) -> DataFrame:
    """Gold ``driverStandings``: A3 + W1
    (``Transform Silver Data.py:128-139``). Note: computed downstream of
    the (possibly lossy) raceResults — quirk #4 preserved."""
    standings = conditional_count_agg(
        race_results,
        ["year", "firstName", "surname", "nationality", "constructorName"],
        sum_col="points",
        sum_alias="totalPoints",
        win_cond=F.col("position") == 1,
        win_alias="wins",
    )
    return rank_standings(
        standings, ["year"], [F.desc("totalPoints"), F.desc("wins")], alias="rank"
    )


def build_constructor_standings(race_results: DataFrame) -> DataFrame:
    """Gold ``constructorStandings``: A4 + W1
    (``Transform Silver Data.py:143-154``)."""
    standings = conditional_count_agg(
        race_results,
        ["year", "constructorName"],
        sum_col="points",
        sum_alias="totalPoints",
        win_cond=F.col("position") == 1,
        win_alias="wins",
    )
    return rank_standings(
        standings, ["year"], [F.desc("totalPoints"), F.desc("wins")], alias="rank"
    )


def transform_silver(
    spark: SparkSession, cfg: EngineConfig = DEFAULT_CONFIG
) -> dict[str, str]:
    """Silver → gold: raceResults + both standings marts. Returns
    {mart: gold_path}."""
    read = lambda name: spark.read.parquet(os.path.join(cfg.silver, name))  # noqa: E731
    race_results = build_race_results(
        read("results"),
        read("drivers"),
        read("constructors"),
        read("circuits"),
        read("pitstops"),
        lossy_pitstop_join=cfg.lossy_pitstop_join,
    )
    out = {}
    rr_path = os.path.join(cfg.gold, "raceResults")
    write_parquet(race_results, rr_path)
    out["raceResults"] = rr_path

    rr = spark.read.parquet(rr_path)
    for name, builder in [
        ("driverStandings", build_driver_standings),
        ("constructorStandings", build_constructor_standings),
    ]:
        path = os.path.join(cfg.gold, name)
        write_parquet(builder(rr), path)
        out[name] = path
    return out
