"""Golden coverage for the remaining silver specs (laps — doubly-nested
Races[].Laps[].Timings[] — qualifying with sparse Q2/Q3, status) plus
snapshot time travel."""

from __future__ import annotations

import pytest

from formula_1_spark.config import EngineConfig
from formula_1_spark.plans.medallion import clean_bronze
from formula_1_spark.sources.ingest import fixture_fetchers, run_snapshot
from formula_1_spark.sources.io import list_snapshots, snapshot_at


@pytest.fixture(scope="module")
def silver(tmp_path_factory, spark):
    cfg = EngineConfig(lake_root=str(tmp_path_factory.mktemp("lake2")))
    snap = run_snapshot(cfg, fixture_fetchers(seasons=[1995, 2023]), limit=10)
    return cfg, spark, clean_bronze(spark, snapshot_dir=snap, cfg=cfg)


def test_laps_double_nested_flatten(silver):
    cfg, spark, paths = silver
    laps = spark.read.parquet(paths["laps"])
    # 2023: 3 races x 2 laps x 3 timings; 1995 gated out (empty arrays
    # become NULL rows via explode_outer).
    live = laps.filter("driverRef IS NOT NULL")
    assert live.count() == 18
    assert {r["year"] for r in live.select("year").distinct().collect()} == {2023}
    assert dict(laps.dtypes)["lapNumber"] == "int"
    assert dict(laps.dtypes)["lapTime"] == "string"  # quirk #5
    row = live.filter("lapNumber = 2 AND driverRef = 'driver_0'").collect()[0]
    assert row["lapTime"].startswith("1:32")


def test_qualifying_sparse_columns(silver):
    cfg, spark, paths = silver
    q = spark.read.parquet(paths["qualifying"])
    assert q.count() == 36  # 2 seasons x 3 races x 6 drivers
    # Sparse fields: Q2 only top-4, Q3 only top-2 per race.
    assert q.filter("q2 IS NOT NULL").count() == 24
    assert q.filter("q3 IS NOT NULL").count() == 12
    assert dict(q.dtypes)["position"] == "int"


def test_status_spec(silver):
    cfg, spark, paths = silver
    s = spark.read.parquet(paths["status"])
    rows = {r["status"]: r["count"] for r in s.collect()}
    assert rows == {"Finished": 5, "Engine": 1}
    assert dict(s.dtypes)["statusId"] == "int"


def test_snapshot_time_travel(tmp_path, spark):
    import os
    import time

    cfg = EngineConfig(lake_root=str(tmp_path / "tt"))
    f = fixture_fetchers(seasons=[2022])
    s1 = run_snapshot(cfg, {"seasons": f["seasons"]}, limit=10)
    time.sleep(0.05)
    os.utime(s1)  # ensure distinct mtimes even on coarse filesystems
    time.sleep(0.05)
    s2 = run_snapshot(cfg, {"seasons": f["seasons"]}, limit=10)
    snaps = list_snapshots(cfg.bronze)
    assert len(snaps) == 2 or s1 == s2  # same-second names collapse
    if len(snaps) == 2:
        assert snapshot_at(cfg.bronze, 0) != snapshot_at(cfg.bronze, -1)
        assert snapshot_at(cfg.bronze, -1) == snaps[-1]
